from geovpr.models.registry import build_backbone
from geovpr.models.backbone import BackboneOutput

__all__ = ["BackboneOutput", "build_backbone"]
