from .trainer import QuantizerTrainer, make_optimizer, total_loss

__all__ = ["QuantizerTrainer", "make_optimizer", "total_loss"]
