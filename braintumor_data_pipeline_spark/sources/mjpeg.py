"""MJPEG-style video container: concatenated baseline JPEG frames
(VERDICT r2 item 4).

Replaces the video-decode stub: MJPEG is the one video "codec" that is
just independent JPEG stills back-to-back, so the repo's own baseline
JPEG codec (``sources/jpeg.py``) makes both directions real with no
external library. ``split_mjpeg`` finds frame boundaries by SOI/EOI
markers — safe because within entropy-coded data a literal 0xFF byte is
always byte-stuffed as FF 00 (and FF D0-D7 restarts), so FF D9 can only
be an end-of-image marker.

Frame SAMPLING happens on the byte ranges (split is O(bytes)); only the
selected frames are entropy-decoded — the property that matters when a
100 TB corpus samples every Nth frame: decode cost scales with frames
kept, not frames stored.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg

_SOI = b"\xff\xd8"
_EOI = b"\xff\xd9"


def encode_mjpeg(frames: list[np.ndarray], quality: int = 90) -> bytes:
    """Concatenate per-frame baseline JPEGs into one payload."""
    return b"".join(encode_jpeg(f, quality=quality) for f in frames)


def split_mjpeg(payload: bytes) -> list[bytes]:
    """Byte ranges of each JPEG frame (no entropy decode)."""
    frames = []
    pos = 0
    while True:
        start = payload.find(_SOI, pos)
        if start < 0:
            break
        stop = payload.find(_EOI, start + 2)
        if stop < 0:
            raise ValueError("truncated MJPEG payload: SOI without EOI")
        frames.append(payload[start:stop + 2])
        pos = stop + 2
    if not frames:
        raise ValueError("no JPEG frames in payload")
    return frames


def decode_mjpeg_frames(
    payload: bytes, every_nth: int = 1
) -> Iterator[tuple[int, np.ndarray]]:
    """Yield (frame_index, pixel array) for every Nth frame — split all
    boundaries, decode only the sampled frames."""
    if every_nth < 1:
        raise ValueError("every_nth must be >= 1")
    for idx, blob in enumerate(split_mjpeg(payload)):
        if idx % every_nth == 0:
            yield idx, decode_jpeg(blob)
