from .steps import TrainState, create_train_state, make_train_step, make_valid_step
