# 1x schedule (reference configs/_base_/schedules/schedule_1x.py): 12 epochs,
# SGD, linear warmup 500 iters x0.001, MultiStep [8, 11] gamma 0.1.
train_cfg = dict(epochs=12, val_interval=1)

optim = dict(
    lr=0.01,
    momentum=0.9,
    weight_decay=1e-4,
    warmup_iters=500,
    warmup_factor=0.001,
    milestones_epochs=(8, 11),
    gamma=0.1,
    grad_clip=None,
)

auto_scale_lr = dict(enable=True, base_batch_size=16)
