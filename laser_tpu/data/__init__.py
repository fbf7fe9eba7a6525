from .loader import ArrayDataset, DataLoader, TokenDataset

__all__ = ["ArrayDataset", "DataLoader", "TokenDataset"]
