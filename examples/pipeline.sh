#!/usr/bin/env bash
# End-to-end pipelines mirroring the reference workflows
# (face_reenactment/metrics.sh + talking_face/sample.sh histories).
set -euo pipefail

CKPT=${CKPT:-/path/to/reference_or_orbax_ckpt}
MEAD_ROOT=${MEAD_ROOT:-/data/MEAD_v2}
AUDIO_FEATS=${AUDIO_FEATS:-/data/MEAD/precomputed_audio_features}

# ---------- 0. offline preprocessing ----------
# aligned AffectNet crops (landmarks from your detector of choice)
# python scripts/preprocess_faces.py --mode align --images raw/ --landmarks lm/ --outdir aligned/ --label 1
# wav2vec2 audio features at video fps
# python scripts/mead_audio_features.py --tuples train.pkl --audio-root $MEAD_ROOT --frames-root $MEAD_ROOT --outdir $AUDIO_FEATS

# ---------- 1. first-stage VQGAN ----------
# python main.py --base configs/autoencoder/vqgan-f4.yaml -t

# ---------- 2. LDM training ----------
# python main.py --base configs/latent-diffusion/mead-128-ldm-f4.yaml -t

# ---------- 3. face reenactment: sampling + editing ----------
python scripts/sample_affectnet.py \
    --config configs/latent-diffusion/affectnet-128-ldm-vq-f4.yaml \
    --ckpt "$CKPT" --outdir out/samples --n-samples 16 --steps 50 --scale 3.0

python scripts/compute_latents.py \
    --config configs/latent-diffusion/affectnet-128-ldm-vq-f4.yaml \
    --ckpt "$CKPT" --list val_aligned.txt --outdir out/latents --steps 40 --strength 0.5

python scripts/latent_manipulation.py \
    --config configs/latent-diffusion/affectnet-128-ldm-vq-f4.yaml \
    --ckpt "$CKPT" --images face.jpg --src-class 0 --targets 1 2 6 \
    --steps 40 --strength 0.5 --outdir out/edits

# ---------- 4. talking-face video synthesis ----------
python scripts/progressive_sampling.py \
    --config configs/latent-diffusion/mead-128-ldm-f4.yaml \
    --ckpt "$CKPT" --tuples val.pkl --data-root "$MEAD_ROOT" \
    --audio-dir "$AUDIO_FEATS" --outdir out/vids --steps 50 --scale 2.0
python scripts/save_videos.py --indir out/vids --outdir out/mp4s

# ---------- 5. evaluation ----------
python scripts/image_metrics.py --gen out/vids --gt gt_frames/ --log metric_logs.txt
python scripts/manipulation_metrics.py --edited-root out/edits \
    --original out/latents/origin.npy --out-csv out/manip_metrics.csv
# python scripts/csim.py --dir-a out/samples --dir-b sources/ --weights arcface.pth
# python scripts/emorec.py --samples out/samples --enet hsemotion_enet_b2_7.pt   # torch-free in-tree EfficientNet-B2
# python scripts/fid_metrics.py --gen out/samples --ref val_images/ --torch-extractor inception.pt
# python scripts/run_av_hubert.py --hyp-json avhubert_hyps.json --transcripts mead_annotated.txt
# one-command torch A/B against the reference on identical inputs/noise:
# python scripts/parity_e2e.py --config configs/latent-diffusion/mead-256-ldm-f4-fullattn.yaml \
#     --ckpt "$CKPT" --frames 8 --steps 50 --arcface arcface.pth
