from .logging import ScalarLogger

__all__ = ["ScalarLogger"]
