from .config import ExperimentConfig, load_experiment_config, parse_hocon
from .step import TrainState, make_train_step, make_lr_schedule, init_train_state
