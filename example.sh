#!/usr/bin/env bash
# Canonical invocations (mirrors the reference's example.sh).

# original training
python main.py train -t /train_set/ -v /val_set/

# triplet loss training
python main.py train -t /train_set/ -v /val_set/ --loss triplet --miner '<miner-type>'

# inference
python main.py inference -d /inference_set/ -r /checkpoint.pth.tar --inference-strategy '<inference-strategy>' -s /predictions/

# inference with probability
python main.py inference -d /inference_set/ -r /checkpoint.pth.tar --inference-strategy '<inference-strategy>' --probability --fusion '<fusion-op>' -s /predictions/

# batched multi-video inference (TPU throughput extension; works with every strategy)
python main.py inference -d /inference_set/ -r /checkpoint.pth.tar --video-batch 8 -s /predictions/

# multi-chip inference: memory bank sharded over 8 chips (long videos / big banks)
python main.py inference -d /inference_set/ -r /checkpoint.pth.tar --bank-shards 8 -s /predictions/

# multi-chip inference: 32 lockstep videos data-parallel over 8 chips (throughput)
python main.py inference -d /inference_set/ -r /checkpoint.pth.tar --video-batch 32 --dp-shards 8 -s /predictions/

# 2-D inference mesh: 8 lockstep videos over 2 chips x each bank over 4 chips
python main.py inference -d /inference_set/ -r /checkpoint.pth.tar --video-batch 8 --dp-shards 2 --bank-shards 4 -s /predictions/

# training with the decoded-frame cache (epochs >= 2 skip image decode; ~15 GB RAM on DAVIS)
python main.py train -t /train_set/ -v /val_set/ --decode-cache

# validation
python main.py validation -d /val_set/ -c /checkpoints -o losses.json --loss '<loss-type>' --miner '<miner-type>'

# evaluation
python main.py evaluation -g /ground_truth_data -c /predicted_data

# video rendering
python visualization.py overlay -p /predictions/video -s /frames/video -o out.mp4

# --- pretrained-weight provisioning (no egress in this environment) ---
# The reference self-initialises from the torchvision model zoo
# (src/model/backbone/resnet.py:159-227, dropping layer4/fc) and pulls the
# facebook swsl weights via torch.hub (src/model/vos_net.py:29-38). Here the
# same initialisation comes from a LOCAL torchvision state_dict:
#
#   1. on any machine with egress:
#        python -c "import torch, torchvision; \
#            torch.save(torchvision.models.resnet50(weights='IMAGENET1K_V1').state_dict(), 'resnet50_imagenet.pth')"
#      (facebook variant: torch.hub.load('facebookresearch/semi-supervised-ImageNet1K-models', 'resnet50_swsl'))
#   2. copy the file next to the dataset, then:
python main.py train -t /train_set/ -v /val_set/ --pretrained /weights/resnet50_imagenet.pth
# On an egress-enabled host, omitting --pretrained self-initialises from the
# torchvision zoo exactly like the reference (download is sha256-verified and
# cached in ~/.cache/svos_model_zoo); a local mirror works via
#   SVOS_ZOO_URL_RESNET50=file:///weights/resnet50-19c8e357.pth
# and SVOS_ZOO=0 forces a hermetic random init.

# reference-trained checkpoints (.pth.tar) load directly for inference/validation,
# and our Orbax checkpoints can be exported BACK to torch format
# (models/convert.py::export_torch_checkpoint — round-trip tested in
# tests/test_export_torch.py against the reference's own load_model).
