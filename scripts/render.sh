#!/usr/bin/env bash
# Assemble video frames rendered by `tpurt --frames N` into an mp4 and
# gif, matching the reference's render.sh (frames at img/output_%d.bmp).
set -euo pipefail

DIR="${1:-img}"
FPS="${2:-60}"

if ! command -v ffmpeg >/dev/null; then
  echo "ffmpeg not found; install it to assemble ${DIR}/output_%d.bmp" >&2
  exit 1
fi

ffmpeg -y -framerate "$FPS" -i "${DIR}/output_%d.bmp" \
  -c:v libx264 -pix_fmt yuv420p "${DIR}/output.mp4"
ffmpeg -y -framerate "$FPS" -i "${DIR}/output_%d.bmp" "${DIR}/output.gif"
echo "wrote ${DIR}/output.mp4 and ${DIR}/output.gif"
