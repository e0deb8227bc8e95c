from .parallel import make_mesh, param_sharding, batch_sharding, replicated
from .multihost import (
    initialize as initialize_multihost,
    stripe,
    local_batch_to_global,
    barrier,
    process_local_batch_size,
)
from .state import TrainState, create_train_state, depth_optimizer, normal_optimizer
from .depth import (
    make_depth_train_step, make_depth_eval_step, depth_loss_fn, SSI_ONLY_STEPS,
)
from .normal import make_normal_train_step, make_normal_eval_step, normal_loss_fn
from .callbacks import save_crash_dump, save_validation_images
from .metrics import normal_metrics, depth_metrics
