"""Inspect the compiled chunk-scan programs for the single and batched
engines: memory analysis + copy/fusion counts in the optimized HLO.

prof/ab_glue2.py localised the batched engine's +0.4 ms/lane-frame step gap
to the bank write (gap vanishes with nowrite, persists with noonehot). The
feats bank is 1.23 GB batched vs 153 MB single; a failed in-place DUS on
the scan carry would cost a full-bank copy/iteration = ~3.1 ms/step = the
measured gap. This dumps the evidence.
"""
import re

import numpy as np

from semi_supervised_vos_tpu.utils.runtime import setup_backend

setup_backend()

import jax
import jax.numpy as jnp

from semi_supervised_vos_tpu.infer.batched import BatchedPropagationEngine
from semi_supervised_vos_tpu.infer.engine import EngineConfig, PropagationEngine
from semi_supervised_vos_tpu.models.vos_net import VOSNet

H, W = 480, 854
B, CHUNK = 8, 8

net = VOSNet(model="resnet50", dtype=jnp.bfloat16)
variables = net.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))
cfg = EngineConfig()

eng = PropagationEngine(net, variables, (H, W), cfg)
beng = BatchedPropagationEngine(net, variables, (H, W), B, cfg)

fr_s = jax.ShapeDtypeStruct((CHUNK, H, W, 3), jnp.uint8)
fr_b = jax.ShapeDtypeStruct((CHUNK, B, H, W, 3), jnp.uint8)
st_s = jax.eval_shape(eng.init_state)
st_b = jax.eval_shape(beng.init_state)
idx = jax.ShapeDtypeStruct((), jnp.int32)
ep_s = jax.eval_shape(lambda: eng.enc_params)
ep_b = jax.eval_shape(lambda: beng.enc_params)
wd = jax.eval_shape(lambda: eng._wd)
ws = jax.eval_shape(lambda: eng._ws)


def inspect(name, jitted, *args):
    lowered = jitted.lower(*args)
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    print(f"== {name} ==")
    print(
        f"  temp {mem.temp_size_in_bytes/1e6:.1f} MB | "
        f"args {mem.argument_size_in_bytes/1e6:.1f} MB | "
        f"out {mem.output_size_in_bytes/1e6:.1f} MB | "
        f"alias {mem.alias_size_in_bytes/1e6:.1f} MB"
    )
    txt = compiled.as_text()
    # count copy ops inside while bodies, with operand shapes
    copies = re.findall(r"copy(?:-start|-done)?\([^)]*\)", txt)
    big = [ln.strip()[:160] for ln in txt.splitlines()
           if (" copy(" in ln or "copy-start(" in ln) and ("f32[" in ln or "bf16[" in ln)]
    print(f"  copy ops: {len(big)}")
    for ln in big[:20]:
        print("   ", ln)
    return txt


txt_s = inspect(
    "single step_chunk_small",
    jax.jit(eng._step_chunk_small_impl, donate_argnums=(2,)),
    ep_s, fr_s, st_s, idx, wd, ws,
)
txt_b = inspect(
    "batched step_chunk_small",
    jax.jit(beng._step_chunk_small_impl, donate_argnums=(2,)),
    ep_b, fr_b, st_b, idx,
)
with open("/tmp/hlo_single.txt", "w") as f:
    f.write(txt_s)
with open("/tmp/hlo_batched.txt", "w") as f:
    f.write(txt_b)
print("HLO written to /tmp/hlo_single.txt /tmp/hlo_batched.txt")
