"""semi_supervised_vos_tpu — TPU-native transductive video object segmentation.

A from-scratch JAX/Flax/Pallas framework with the capabilities of
hynekdav/semi-supervised-VOS (transductive VOS by label propagation,
Zhang et al. arXiv 2004.07193), redesigned TPU-first:

* stride-8 ResNet feature extractor as a Flax (NHWC) backbone compiled by XLA
  (reference: ``src/model/backbone/resnet.py``, ``src/model/vos_net.py``)
* the hot pixel-affinity / label-propagation path as pure functions plus a
  fused, online-softmax Pallas TPU kernel (reference: ``src/model/predict.py``)
* a fixed-capacity ring memory bank instead of the reference's unbounded
  ``torch.cat`` feature history (reference: ``src/utils/inference_utils.py:71-72``)
* data/model parallelism via ``jax.sharding`` meshes and collectives instead of
  ``torch.nn.DataParallel`` (reference: ``src/train.py:113``)

Subpackages
-----------
core      propagation math: frame sampling, spatial weights, affinity softmax
models    Flax ResNet backbones, VOSNet, torch-checkpoint conversion
ops       device kernels: fused Pallas affinity, nearest resize, one-hot, quantize
parallel  mesh construction, sharding rules, sharded (ring) affinity
data      DAVIS-style datasets, clip sampling, host decode + device preprocessing
train     losses, triplet miners, optimizer/schedule, train loop, early stopping
infer     per-video propagation engine and the seven inference strategies
eval      DAVIS J&F metrics and the evaluation command implementation
utils     logging, palette-PNG IO, morphology (skeleton/distance transforms)
viz       video rendering (overlay / side-by-side / prediction-only)
cli       Click commands mirroring the reference CLI surface
"""

__version__ = "0.1.0"
