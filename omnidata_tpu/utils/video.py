"""Trajectory video assembly (reference: paper_code/make_video.py + the
smooth-trajectory frames with camera_uuid = zero-padded frame index).

Assembles point_{p}_view_{t:04d}_domain_{task}.png sequences into an mp4 via
ffmpeg when present, else falls back to an animated GIF via PIL.
"""
from __future__ import annotations

import glob
import os
import shutil
import subprocess


def make_video(frames_dir: str, task: str, out_path: str, fps: int = 15) -> str:
    import re

    pattern = os.path.join(frames_dir, f"point_*_view_*_domain_{task}.png")

    def order_key(p):
        # numeric (point, view) ordering: lexical sort puts point_10 before
        # point_2 (view ids are zero-padded, point ids are not)
        m = re.search(r"point_(\d+)_view_(\d+)_", os.path.basename(p))
        return (int(m.group(1)), int(m.group(2))) if m else (1 << 30, p)

    frames = sorted(glob.glob(pattern), key=order_key)
    if not frames:
        raise FileNotFoundError(f"no frames matching {pattern}")
    if shutil.which("ffmpeg"):
        list_file = os.path.join(frames_dir, f"_{task}_frames.txt")
        with open(list_file, "w") as fh:
            for f in frames:
                fh.write(f"file '{os.path.abspath(f)}'\nduration {1.0/fps}\n")
        subprocess.run(
            ["ffmpeg", "-y", "-f", "concat", "-safe", "0", "-i", list_file,
             "-pix_fmt", "yuv420p", out_path],
            check=True, capture_output=True,
        )
        os.remove(list_file)
        return out_path
    # GIF fallback
    from PIL import Image

    gif = os.path.splitext(out_path)[0] + ".gif"
    imgs = [Image.open(f).convert("RGB") for f in frames]
    imgs[0].save(gif, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / fps), loop=0)
    return gif
