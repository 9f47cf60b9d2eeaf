from geovpr.objectives.angle_codec import SinCosCodec, wrap_degrees
from geovpr.objectives.losses import (
    acos_angular_loss_deg,
    angular_error_deg,
    competition_loss,
    huber_loss,
    maae_deg,
    mse_loss,
)
from geovpr.objectives.scaler import ScalerState, fit_scaler

__all__ = [
    "SinCosCodec",
    "ScalerState",
    "acos_angular_loss_deg",
    "angular_error_deg",
    "competition_loss",
    "fit_scaler",
    "huber_loss",
    "maae_deg",
    "mse_loss",
    "wrap_degrees",
]
