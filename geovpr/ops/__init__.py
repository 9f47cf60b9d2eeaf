from geovpr.ops.window_attention import window_attention

__all__ = ["window_attention"]
