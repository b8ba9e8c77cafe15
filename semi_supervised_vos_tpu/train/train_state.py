"""Train state, optimizer, LR schedule and checkpointing.

Optimizer parity with the reference (``src/train.py:75-81``): SGD with
Nesterov momentum 0.9, weight decay 3e-4 coupled into the gradient (torch
semantics), cosine-annealed learning rate stepped **per epoch** down to
eta_min = 4e-5.

Checkpointing goes beyond the reference: the full train state (params, BN
stats, optimizer state, epoch) is saved with Orbax every epoch, fixing the
reference's resume gap where ``--resume`` restores weights only
(``train.py:108-114``). Reference ``.pth.tar`` checkpoints still load as
weights via :mod:`semi_supervised_vos_tpu.models.convert`.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    epoch: jnp.ndarray  # int32 scalar


def cosine_lr(epoch, *, base_lr: float, epochs: int, eta_min: float = 4e-5):
    """torch ``CosineAnnealingLR(T_max=epochs, eta_min)`` closed form."""
    return eta_min + (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * epoch / epochs)) / 2


def make_optimizer(
    base_lr: float = 0.02,
    momentum: float = 0.9,
    weight_decay: float = 3e-4,
    nesterov: bool = True,
) -> optax.GradientTransformation:
    """SGD+Nesterov with torch-coupled weight decay; the learning rate is
    injected per step (epoch-wise cosine happens in the train loop)."""
    return optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.trace(decay=momentum, nesterov=nesterov),
            optax.scale_by_learning_rate(learning_rate),
        )
    )(learning_rate=base_lr)


def set_learning_rate(opt_state, lr):
    """Update the injected learning rate in-place (per-epoch schedule)."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


def init_train_state(net, rng, input_shape, tx) -> TrainState:
    variables = net.init(rng, jnp.zeros(input_shape, jnp.float32), train=False)
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(params),
        epoch=jnp.int32(0),
    )


# ---- persistence -----------------------------------------------------------


def checkpoint_name(epoch: int, train_loss: float, val_loss: float) -> str:
    """Reference filename scheme (``train.py:144``) with an Orbax suffix."""
    return "checkpoint-epoch-{:03d}-{:5f}-{:5f}.ckpt".format(epoch, train_loss, val_loss)


def save_checkpoint(state: TrainState, path) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        path,
        {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "opt_state": jax.device_get(state.opt_state),
            "epoch": int(state.epoch),
        },
        force=True,
    )
    ckptr.wait_until_finished()


def restore_checkpoint(path, state: TrainState) -> TrainState:
    """Restore a full Orbax train state saved by :func:`save_checkpoint`."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    template = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "epoch": 0,
    }
    restored = ckptr.restore(path, template)
    return TrainState(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        epoch=jnp.int32(restored["epoch"]),
    )


def load_weights(path, state: TrainState, model: str) -> TrainState:
    """Load weights from either format: an Orbax directory (full state) or a
    torch ``.pth.tar`` (weights only, like the reference's resume)."""
    path = Path(path)
    if path.is_dir():
        return restore_checkpoint(path, state)
    from semi_supervised_vos_tpu.models.convert import load_torch_checkpoint

    variables = load_torch_checkpoint(str(path), model)
    return state._replace(
        params=variables["params"], batch_stats=variables["batch_stats"]
    )
