#!/bin/bash
# Checkpoint fetcher (counterpart of download_models.sh). Downloads the public
# DUSt3R/MASt3R checkpoints this framework converts on the fly. Requires
# network access.
set -euo pipefail

mkdir -p checkpoints
cd checkpoints

DUSTR_URL="https://download.europe.naverlabs.com/ComputerVision/DUSt3R/DUSt3R_ViTLarge_BaseDecoder_224_linear.pth"
MASTR_URL="https://download.europe.naverlabs.com/ComputerVision/MASt3R/MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric.pth"

for url in "$DUSTR_URL" "$MASTR_URL"; do
    f="$(basename "$url")"
    if [[ -f "$f" ]]; then
        echo "$f already present"
    else
        echo "fetching $f"
        curl -fL -o "$f" "$url" || wget -O "$f" "$url"
    fi
done
echo "done; validate with: python -m thermal3d.cli.model_info --checkpoint checkpoints/<ckpt> --validate"
