from .ordering import with_global_seq

__all__ = ["with_global_seq"]
