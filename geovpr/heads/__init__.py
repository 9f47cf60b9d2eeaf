from geovpr.heads.regression import (
    LinearHead,
    MlpHead,
    SinCosHead,
    build_head,
)

__all__ = ["LinearHead", "MlpHead", "SinCosHead", "build_head"]
