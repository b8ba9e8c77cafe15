"""Early stopping on validation loss (reference
``src/utils/early_stopping.py:14-71``): patience-7 monitor that saves the
best model and signals a stop after ``patience`` non-improving validations.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


class EarlyStopping:
    def __init__(
        self,
        directory,
        *,
        patience: int = 7,
        verbose: bool = False,
        delta: float = 0.0,
        path: str = "model.ckpt",
        trace_func=print,
        save_fn=None,
    ):
        self.patience = patience
        self.verbose = verbose
        self.counter = 0
        self.best_score = None
        self.best_epoch = None
        self.early_stop = False
        self.val_loss_min = np.inf
        self.delta = delta
        self.path = path
        self.directory = Path(directory)
        self.trace_func = trace_func
        # save_fn(state, path): injected so this class stays framework-free
        self.save_fn = save_fn

    def __call__(self, val_loss, epoch, state) -> bool:
        score = -val_loss
        if self.best_score is None:
            self.best_score = score
            self.save_checkpoint(val_loss, epoch, state)
        elif score < self.best_score + self.delta:
            self.counter += 1
            self.trace_func(f"EarlyStopping counter: {self.counter} out of {self.patience}")
            if self.counter >= self.patience:
                self.early_stop = True
                self.trace_func(f"Best epoch was {self.best_epoch} with {self.val_loss_min}.")
        else:
            self.best_score = score
            self.save_checkpoint(val_loss, epoch, state)
            self.counter = 0
        return self.early_stop

    def save_checkpoint(self, val_loss, epoch, state) -> None:
        if self.verbose:
            self.trace_func(
                f"Validation loss decreased ({self.val_loss_min:.6f} --> {val_loss:.6f}).  Saving model ..."
            )
        if self.save_fn is not None:
            self.save_fn(state, self.directory / self.path)
        self.val_loss_min = val_loss
        self.best_epoch = epoch
