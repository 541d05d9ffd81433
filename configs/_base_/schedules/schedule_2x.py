# 2x schedule (reference configs/_base_/schedules/schedule_2x.py): 24 epochs,
# SGD, linear warmup 500 iters x0.001, MultiStep [16, 22] gamma 0.1.
train_cfg = dict(epochs=24, val_interval=1)

optim = dict(
    lr=0.01,
    momentum=0.9,
    weight_decay=1e-4,
    warmup_iters=500,
    warmup_factor=0.001,
    milestones_epochs=(16, 22),
    gamma=0.1,
    grad_clip=None,
)

auto_scale_lr = dict(enable=True, base_batch_size=16)
