from geovpr.core.config import (
    AngleConfig,
    DataConfig,
    GeoposeConfig,
    ModelConfig,
    OptimConfig,
    RetrievalConfig,
    TrainConfig,
)
from geovpr.core.dtypes import DTypePolicy
from geovpr.core.prng import PRNGSeq

__all__ = [
    "AngleConfig",
    "DataConfig",
    "DTypePolicy",
    "GeoposeConfig",
    "ModelConfig",
    "OptimConfig",
    "PRNGSeq",
    "RetrievalConfig",
    "TrainConfig",
]
