from .step import cross_entropy_loss, make_train_step

__all__ = ["cross_entropy_loss", "make_train_step"]
