"""Training / evaluation runtime: optimizers, schedules, train loop,
checkpointing, eval (reference /root/reference/tools/train_utils/,
eval_utils/)."""
