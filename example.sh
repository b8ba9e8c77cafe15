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

# batched multi-video inference (TPU throughput extension)
python main.py inference -d /inference_set/ -r /checkpoint.pth.tar --video-batch 8 -s /predictions/

# validation
python main.py validation -d /val_set/ -c /checkpoints -o losses.json --loss '<loss-type>' --miner '<miner-type>'

# evaluation
python main.py evaluation -g /ground_truth_data -c /predicted_data

# video rendering
python visualization.py overlay -p /predictions/video -s /frames/video -o out.mp4
