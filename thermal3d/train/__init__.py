from thermal3d.train.state import create_train_state, make_lr_schedule
from thermal3d.train.step import make_train_step, make_eval_step
from thermal3d.train.loop import train_and_evaluate
