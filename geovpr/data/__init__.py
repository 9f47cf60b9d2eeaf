from geovpr.data.manifest import Manifest, list_test_images, load_manifest

__all__ = ["Manifest", "list_test_images", "load_manifest"]
