from .services import AppServices

__all__ = ["AppServices"]
