from geovpr.retrieval.index import DescriptorIndex, cosine_topk, recall_at_k

__all__ = ["DescriptorIndex", "cosine_topk", "recall_at_k"]
