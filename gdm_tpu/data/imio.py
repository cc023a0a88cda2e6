"""Image decode helpers (host side, cv2).

cv2 decodes straight into a numpy buffer where PIL pays an extra
tobytes copy — measured ~1 ms/sample across the three decodes of a
480x640 BOP frame (rgb jpg + uint16 depth png + mask png), numerically
identical output.  Loud FileNotFoundError instead of cv2's silent
None so a bad record fails at the offending path.
"""

from __future__ import annotations

import cv2
import numpy as np


def imread_rgb(path: str) -> np.ndarray:
    """[H,W,3] uint8 RGB (alpha dropped, matching np.array(PIL)[:,:,:3])."""
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def imread_u16(path: str) -> np.ndarray:
    """[H,W] uint16 depth counts (BOP depth PNGs are 16-bit unsigned)."""
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    return np.asarray(img).astype(np.uint16, copy=False)


def imread_mask(path: str) -> np.ndarray:
    """[H,W] uint8 visibility mask (BOP masks are 8-bit grayscale)."""
    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(path)
    return img
