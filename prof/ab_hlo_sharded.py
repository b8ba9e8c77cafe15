"""HLO exposure check: does ShardedPropagationEngine's chunk scan pay the
same in-scan target-transpose layout copy the batched engine did?

Compile-only (no timed execution): lower + compile the sharded engine's
_step_chunk_small on a 1-device TPU mesh, print memory analysis and any
bank-sized copies inside the while body. The batched engine's copy was
1.23 GB/iter (prof/ab_hlo.py); the sharded single-video bank here is
(cap, p_loc, C) = 45x6656x256 bf16 = 153 MB — a per-iteration copy would
cost ~0.4 ms/frame on the production --bank-shards path.
"""
import re

import numpy as np

from semi_supervised_vos_tpu.utils.runtime import setup_backend

setup_backend()

import jax
import jax.numpy as jnp

from semi_supervised_vos_tpu.infer.engine import EngineConfig
from semi_supervised_vos_tpu.models.vos_net import VOSNet
from semi_supervised_vos_tpu.parallel.engine_sharded import (
    ShardedPropagationEngine,
)

H, W = 480, 854
CHUNK = 8

net = VOSNet(model="resnet50", dtype=jnp.bfloat16)
variables = net.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))
cfg = EngineConfig()

from jax.sharding import Mesh

mesh = Mesh(np.asarray(jax.devices()[:1]), ("model",))
eng = ShardedPropagationEngine(net, variables, (H, W), cfg, mesh)

fr = jax.ShapeDtypeStruct((CHUNK, H, W, 3), jnp.uint8)
st = jax.eval_shape(eng.init_state)
idx = jax.ShapeDtypeStruct((), jnp.int32)
ep = jax.eval_shape(lambda: eng.enc_params)

lowered = jax.jit(eng._step_chunk_small_impl, donate_argnums=(2,)).lower(
    ep, fr, st, idx
)
compiled = lowered.compile()
mem = compiled.memory_analysis()
print(
    f"temp {mem.temp_size_in_bytes/1e6:.1f} MB | "
    f"args {mem.argument_size_in_bytes/1e6:.1f} MB | "
    f"alias {mem.alias_size_in_bytes/1e6:.1f} MB"
)
txt = compiled.as_text()
with open("/tmp/hlo_sharded.txt", "w") as f:
    f.write(txt)
big = [
    ln.strip()[:200]
    for ln in txt.splitlines()
    if (" copy(" in ln or "copy-start(" in ln)
    and re.search(r"bf16\[45,", ln)
]
print(f"bank-sized copies: {len(big)}")
for ln in big[:10]:
    print("  ", ln)
print("HLO at /tmp/hlo_sharded.txt")
