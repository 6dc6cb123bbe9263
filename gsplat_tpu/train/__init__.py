from .losses import l1, mse, photometric_loss, psnr, quantize8, ssim  # noqa: F401
from .optim import (  # noqa: F401
    OptimizationParams,
    adam_init,
    adam_update,
    lr_exp_scheduler,
    reference_opt_params,
    zero_moment_rows,
)
from .trainer import Trainer, TrainState, eval_view, train_step  # noqa: F401
from .strategy import (  # noqa: F401
    DefaultStrategy,
    MCMCStrategy,
    create_strategy,
    grow_state,
    mcmc_binom_coefficients,
    relocation_params,
)
