#!/usr/bin/env bash
# Generator for results/sweeps/*.json — the reference's ablation surface
# (defectGAN/run.bat, run2.bat: mask_ratio / mask_token_type sweeps whose
# FIDs are the published numbers) on a short synthetic budget, run end to
# end on the TPU: MAE pretrain -> DefectGAN warm-start train -> FID eval
# per swept value, via cli/sweep.py.
#
#   bash results/sweeps/run_sweeps.sh
#
# Budget note: synthetic dataset, 64^2, reduced widths, 1 epoch per stage,
# CPU host — the point is a reproducible, committed demonstration of the
# full sweep recipe (the FID values are synthetic-data placeholders, not
# the published CodeBrim numbers, which need the real dataset this image
# does not ship). Drop the size overrides and run on real data/TPU for
# research-scale sweeps.
set -euo pipefail
cd "$(dirname "$0")/../.."

CKPT=$(mktemp -d /tmp/sweep_ckpt.XXXX)
COMMON=(--dataset_name synthetic --image_size 64 --num_epochs 1
        --batch_size 8 --ngf 16 --ndf 16 --num_res 2 --hidden_nc 32
        --embed_nc 96)
# CPU: unregister the tunneled TPU (remote compiles serialize; the demo
# budget fits the host) — see CLAUDE.md environment notes
RUN=(env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python)

"${RUN[@]}" -m de_i2i_gan_tpu.cli.sweep --axis mask_ratio \
    --values 0.25 0.5 0.75 --eval \
    --ckpt_dir "$CKPT" --out_dir results/sweeps -- "${COMMON[@]}"

"${RUN[@]}" -m de_i2i_gan_tpu.cli.sweep --axis mask_token_type \
    --values zero scalar position --eval \
    --ckpt_dir "$CKPT" --out_dir results/sweeps -- "${COMMON[@]}"
