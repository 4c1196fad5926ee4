"""Training: Trainer, loss, noise and pushforward strategies."""

from .strats import add_gns_noise, push_forward_build, push_forward_sample_steps
from .trainer import Trainer, mse_loss

__all__ = [
    "Trainer",
    "mse_loss",
    "add_gns_noise",
    "push_forward_build",
    "push_forward_sample_steps",
]
