from geovpr.pipeline.export import (
    write_angle_test_csv,
    write_angle_validation_csv,
    write_geopose_preds_csv,
    write_geopose_test_csv,
    write_geopose_validation_csv,
)

__all__ = [
    "write_angle_test_csv",
    "write_angle_validation_csv",
    "write_geopose_preds_csv",
    "write_geopose_test_csv",
    "write_geopose_validation_csv",
]
