"""Training callbacks (reference behaviors):

- crash dump: on any exception in the step loop, save params + the offending
  batch for post-mortem (train_normal.py:188-203,341-348
  register_save_on_error_callback / crash_model.pth + crash_batch.pth)
- validation image dumps every log_step steps (train_normal.py:295-331)
"""
from __future__ import annotations

import os
import pickle

import numpy as np


def save_crash_dump(directory: str, params, batch, error: BaseException) -> str:
    os.makedirs(directory, exist_ok=True)
    import jax

    with open(os.path.join(directory, "crash_model.pkl"), "wb") as fh:
        pickle.dump(jax.device_get(params), fh)
    with open(os.path.join(directory, "crash_batch.pkl"), "wb") as fh:
        pickle.dump(jax.device_get(batch), fh)
    with open(os.path.join(directory, "crash_error.txt"), "w") as fh:
        fh.write(repr(error))
    return directory


def save_validation_images(directory: str, step: int, rgb, pred, target) -> None:
    """Side-by-side rgb | prediction | target PNG per sample (first 4)."""
    from PIL import Image

    os.makedirs(directory, exist_ok=True)

    def to_img(x):
        x = np.asarray(x)
        if x.ndim == 3 and x.shape[0] in (1, 3):
            x = x.transpose(1, 2, 0)
        if x.ndim == 2:
            x = x[..., None]
        if x.shape[-1] == 1:
            x = np.repeat(x, 3, -1)
        return (np.clip(x, 0, 1) * 255).astype(np.uint8)

    n = min(4, len(rgb))
    for i in range(n):
        row = np.concatenate([to_img(rgb[i]), to_img(pred[i]), to_img(target[i])], 1)
        Image.fromarray(row).save(
            os.path.join(directory, f"step{step}_sample{i}.png")
        )
