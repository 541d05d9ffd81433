# Runtime defaults (reference configs/_base_/default_runtime.py analogue).
log_interval = 50
ckpt_interval_epochs = 1
work_dir = 'work_dirs'
seed = 0
resume = False
