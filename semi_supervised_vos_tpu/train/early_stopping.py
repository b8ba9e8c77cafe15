"""Validation-loss plateau detection.

Capability parity with the reference's patience-based early stopping
(``src/utils/early_stopping.py``), redesigned as a pure state transition
(``plateau_update``) plus a thin imperative shell that persists the best
checkpoint (``EarlyStopping``).

Documented deviation: the reference is invoked every epoch but validation
runs only every 10th, so it receives ``NaN`` most epochs; NaN comparisons
route it into the "improved" branch, which resets the counter and saves a
"best" checkpoint with an undefined loss — with the default schedule it can
never actually stop (``src/train.py:133-140``). We reproduce the *intent*:
a non-finite loss carries no signal, so it neither advances the stale
counter nor touches the best checkpoint.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, replace
from pathlib import Path
from typing import Callable, Optional, Tuple


@dataclass(frozen=True)
class PlateauMonitor:
    """Immutable record of the best validation loss seen so far."""

    best_loss: float = math.inf
    best_epoch: int = -1
    stale: int = 0


def plateau_update(
    monitor: PlateauMonitor,
    val_loss: float,
    epoch: int,
    *,
    patience: int = 7,
    min_delta: float = 0.0,
) -> Tuple[PlateauMonitor, bool, bool]:
    """Pure transition: ``(monitor, loss, epoch) -> (monitor', improved, stop)``.

    ``improved`` means the caller should snapshot the model now; ``stop``
    becomes true once ``patience`` consecutive informative validations fail
    to beat the best loss by more than ``min_delta``.
    """
    if not math.isfinite(val_loss):
        return monitor, False, False
    if val_loss < monitor.best_loss - min_delta:
        return PlateauMonitor(float(val_loss), int(epoch), 0), True, False
    bumped = replace(monitor, stale=monitor.stale + 1)
    return bumped, False, bumped.stale >= patience


class EarlyStopping:
    """Imperative shell over :func:`plateau_update` that writes the best
    checkpoint into ``directory / filename`` via the injected ``save_fn``."""

    def __init__(
        self,
        directory,
        *,
        patience: int = 7,
        min_delta: float = 0.0,
        filename: str = "model.ckpt",
        save_fn: Optional[Callable] = None,
        log: Optional[Callable[[str], None]] = None,
    ):
        self.monitor = PlateauMonitor()
        self.patience = patience
        self.min_delta = min_delta
        self.target = Path(directory) / filename
        self.save_fn = save_fn
        self.log = log or (lambda _msg: None)

    def __call__(self, val_loss, epoch: int, train_state) -> bool:
        prev = self.monitor
        self.monitor, improved, stop = plateau_update(
            prev, float(val_loss), epoch,
            patience=self.patience, min_delta=self.min_delta,
        )
        if improved:
            self.log(
                f"best val loss {prev.best_loss:.6f} -> {self.monitor.best_loss:.6f}"
                f" at epoch {epoch}; snapshotting to {self.target}"
            )
            if self.save_fn is not None:
                self.save_fn(train_state, self.target)
        elif self.monitor.stale != prev.stale:
            self.log(
                f"no improvement for {self.monitor.stale}/{self.patience} validations"
            )
        if stop:
            self.log(
                f"plateau reached — best epoch {self.monitor.best_epoch}"
                f" (val loss {self.monitor.best_loss:.6f})"
            )
        return stop

    # Introspection conveniences used by callers/tests.
    @property
    def best_epoch(self) -> int:
        return self.monitor.best_epoch

    @property
    def val_loss_min(self) -> float:
        return self.monitor.best_loss
