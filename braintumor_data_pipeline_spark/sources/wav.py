"""RIFF/WAVE PCM codec — pure stdlib/numpy (VERDICT r2 item 3).

Replaces the audio-decode stub in the multimodal surface: WAV is the one
audio container whose payload is raw PCM, so a real decoder needs no
codec library. Parses the RIFF chunk list (tolerating LIST/fact/bext and
other non-essential chunks, word-aligned), reads ``fmt `` (PCM u8/s16/
s24 and IEEE float32), and returns samples as ``int16`` — the common
feature-stage currency — plus the sample rate.

Container layout (public spec, summarised):
  'RIFF' <u32 size> 'WAVE' then chunks: <4cc> <u32 size> <payload>
  [pad byte if size odd]. 'fmt ': u16 format(1=PCM, 3=float,
  0xFFFE=extensible), u16 channels, u32 sample_rate, u32 byte_rate,
  u16 block_align, u16 bits_per_sample [, ext]. 'data': frames of
  interleaved channel samples.
"""

from __future__ import annotations

import struct

import numpy as np

_PCM = 1
_FLOAT = 3
_EXTENSIBLE = 0xFFFE


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000
) -> bytes:
    """int16 samples — shape (n,) mono or (n, ch) — → canonical PCM WAV."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n_ch = s.shape[1]
    data = s.reshape(-1).tobytes()
    block_align = n_ch * 2
    fmt = struct.pack(
        "<HHIIHH", _PCM, n_ch, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 samples shaped (n, channels), sample_rate).

    u8 PCM is re-centred (−128)·256; s24 and float32 are scaled into the
    int16 range; s16 passes through bit-exact.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    fmt = None
    data = None
    while pos + 8 <= end:
        tag = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        chunk = payload[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk truncated")
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif tag == b"data":
            data = chunk
        # any other chunk (LIST, fact, bext, id3 …) is skipped
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt / data chunk")
    audio_format, n_ch, sample_rate, _rate, _align, bits = fmt
    if audio_format == _EXTENSIBLE:
        audio_format = _PCM  # subformat GUID's first u16 repeats the tag
    if n_ch < 1:
        raise ValueError("channel count must be >= 1")
    if audio_format == _PCM and bits == 16:
        s = np.frombuffer(data, dtype="<i2")
    elif audio_format == _PCM and bits == 8:
        s = ((np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128) * 256)
    elif audio_format == _PCM and bits == 24:
        raw = np.frombuffer(data, dtype=np.uint8)
        raw = raw[: len(raw) - len(raw) % 3].reshape(-1, 3)
        s32 = (
            raw[:, 0].astype(np.int32)
            | (raw[:, 1].astype(np.int32) << 8)
            | (raw[:, 2].astype(np.int32) << 16)
        )
        s32 = np.where(s32 >= 1 << 23, s32 - (1 << 24), s32)
        s = (s32 >> 8).astype(np.int16)
    elif audio_format == _FLOAT and bits == 32:
        f = np.frombuffer(data, dtype="<f4")
        s = np.clip(np.rint(f * 32767.0), -32768, 32767).astype(np.int16)
    else:
        raise ValueError(
            f"unsupported WAV encoding: format={audio_format} bits={bits}"
        )
    n = len(s) - len(s) % n_ch
    return s[:n].reshape(-1, n_ch), sample_rate
