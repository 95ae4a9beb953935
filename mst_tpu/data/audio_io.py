"""Minimal audio IO without torchaudio/librosa/soundfile.

The environment ships none of the reference's audio IO stacks, so WAV
parsing is implemented directly over the RIFF container (PCM 16/24/32-bit
and float32/64) with numpy.  MP3/FLAC decode falls back to an ``ffmpeg``
subprocess when available (the reference shells out to ffmpeg for encoding
too; ref: scripts/preprocess_fma_separation_fast.py:241-248).

Layout convention: audio arrays are ``(channels, T)`` float32 in [-1, 1],
matching the reference's ``load_audio`` (ref: src/data.py:169-199).
"""

from __future__ import annotations

import shutil
import struct
import subprocess
from pathlib import Path

import numpy as np


def read_wav(path: str | Path) -> tuple[np.ndarray, int]:
    """Read a RIFF/WAVE file -> (audio (C, T) float32, sample_rate).

    Uses the native C++ decoder (mst_tpu.native) when available — fused
    parse+convert+deinterleave — falling back to the numpy parser."""
    data = Path(path).read_bytes()
    try:
        from mst_tpu.native import wav_decode_native

        res = wav_decode_native(data)
        if res is not None:
            return res
    except Exception:
        pass
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError(f"{path}: not a RIFF/WAVE file")
    pos = 12
    fmt = None
    fmt_body = None
    raw = None
    while pos + 8 <= len(data):
        chunk_id = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        if chunk_id == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_body = body
        elif chunk_id == b"data":
            raw = body
        pos += 8 + size + (size & 1)
    if fmt is None or raw is None:
        raise ValueError(f"{path}: missing fmt/data chunk")
    audio_format, n_ch, sr, _, _, bits = fmt
    if audio_format == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: real code is in the
        # SubFormat GUID at offset 24 of the fmt body (first 2 bytes, LE)
        if fmt_body is not None and len(fmt_body) >= 26:
            audio_format = struct.unpack("<H", fmt_body[24:26])[0]
        else:
            audio_format = 1 if bits in (8, 16, 24) else 3
    if audio_format == 1:  # PCM
        if bits == 16:
            x = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
        elif bits == 32:
            x = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
        elif bits == 24:
            b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
            x = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int8).astype(np.int32) << 16)
            ).astype(np.float32) / 8388608.0
        elif bits == 8:
            x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif audio_format == 3:  # IEEE float
        x = np.frombuffer(raw, "<f4" if bits == 32 else "<f8").astype(np.float32)
    else:
        raise ValueError(f"unsupported WAVE format {audio_format}")
    x = x.reshape(-1, n_ch).T.copy()  # (C, T)
    return x, sr


def write_wav(path: str | Path, audio: np.ndarray, sample_rate: int) -> None:
    """Write (C, T) float32 audio as 16-bit PCM WAV."""
    audio = np.asarray(audio, np.float32)
    if audio.ndim == 1:
        audio = audio[None]
    n_ch, n = audio.shape
    pcm = np.clip(audio.T * 32767.0, -32768, 32767).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, n_ch, sample_rate, sample_rate * n_ch * 2, n_ch * 2, 16
    )
    hdr += b"data" + struct.pack("<I", len(pcm))
    Path(path).write_bytes(hdr + pcm)


def read_audio(path: str | Path, target_sr: int | None = None) -> tuple[np.ndarray, int]:
    """Read any audio file; WAV natively, compressed formats through ffmpeg
    when present, else the SDL_mixer (pygame) decoder."""
    path = Path(path)
    if path.suffix.lower() == ".wav":
        audio, sr = read_wav(path)
    elif shutil.which("ffmpeg") is not None:
        audio, sr = _read_via_ffmpeg(path)
    else:
        audio, sr = _read_via_sdl(path)
    if target_sr is not None and sr != target_sr:
        audio = resample(audio, sr, target_sr)
        sr = target_sr
    return audio, sr


def mpeg_stream_info(path: str | Path) -> tuple[int, int] | None:
    """(sample_rate, channels) from the first MPEG audio frame header, or
    None if no valid header is found.  Scans past ID3v2 tags; used to open
    the SDL decoder at the file's native rate so no resample happens."""
    data = Path(path).read_bytes()
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:  # ID3v2: syncsafe 28-bit size
        size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
        pos = 10 + size
    sr_base = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
               0: (11025, 12000, 8000)}  # MPEG1 / MPEG2 / MPEG2.5
    end = min(len(data) - 4, pos + (1 << 16))
    while pos < end:
        if data[pos] == 0xFF and (data[pos + 1] & 0xE0) == 0xE0:
            version = (data[pos + 1] >> 3) & 0x3
            layer = (data[pos + 1] >> 1) & 0x3
            sr_idx = (data[pos + 2] >> 2) & 0x3
            mode = (data[pos + 3] >> 6) & 0x3
            if version != 1 and layer != 0 and sr_idx != 3:
                return sr_base[version][sr_idx], (1 if mode == 3 else 2)
        pos += 1
    return None


def _read_via_sdl(path: Path) -> tuple[np.ndarray, int]:
    """Decode MP3/OGG/FLAC via SDL_mixer (pygame, baked into the image) —
    the no-ffmpeg fallback.  SDL converts to the opened device spec, so the
    mixer is opened at the file's native rate (mpeg_stream_info) to keep the
    decode bit-true; mono streams are downmixed back from SDL's upmix."""
    import os

    os.environ.setdefault("SDL_AUDIODRIVER", "dummy")
    try:
        import pygame
    except ImportError as e:
        raise RuntimeError(
            f"cannot decode {path.suffix}: neither ffmpeg nor pygame available"
        ) from e
    info = mpeg_stream_info(path) if path.suffix.lower() == ".mp3" else None
    sr, n_ch = info if info is not None else (44100, 2)
    if pygame.mixer.get_init() != (sr, -16, 2):
        pygame.mixer.quit()
        pygame.mixer.init(frequency=sr, size=-16, channels=2)
    snd = pygame.mixer.Sound(str(path))
    arr = pygame.sndarray.array(snd)  # (T, 2) int16 at mixer rate
    x = (arr.astype(np.float32) / 32768.0).T
    if n_ch == 1:
        x = x.mean(axis=0, keepdims=True)
    return np.ascontiguousarray(x), sr


def _read_via_ffmpeg(path: Path) -> tuple[np.ndarray, int]:
    if shutil.which("ffmpeg") is None:
        raise RuntimeError(
            f"cannot decode {path.suffix} without ffmpeg; provide WAV input"
        )
    probe = subprocess.run(
        ["ffprobe", "-v", "error", "-show_entries", "stream=sample_rate,channels",
         "-of", "csv=p=0", str(path)],
        capture_output=True, text=True, check=True,
    )
    sr, n_ch = (int(v) for v in probe.stdout.strip().split("\n")[0].split(","))
    out = subprocess.run(
        ["ffmpeg", "-v", "error", "-i", str(path), "-f", "f32le", "-"],
        capture_output=True, check=True,
    )
    x = np.frombuffer(out.stdout, "<f4").reshape(-1, n_ch).T.copy()
    return x, sr


def write_mp3(path: str | Path, audio: np.ndarray, sample_rate: int,
              bitrate: str = "192k") -> None:
    """Encode (C, T) float32 audio to MP3 via ffmpeg (libmp3lame), matching the
    reference's stem-encoding step (ref: preprocess_fma_separation_fast.py:241-248)."""
    if shutil.which("ffmpeg") is None:
        raise RuntimeError("ffmpeg not available for MP3 encoding")
    audio = np.asarray(audio, np.float32)
    if audio.ndim == 1:
        audio = audio[None]
    n_ch = audio.shape[0]
    subprocess.run(
        ["ffmpeg", "-v", "error", "-y", "-f", "f32le", "-ar", str(sample_rate),
         "-ac", str(n_ch), "-i", "-", "-b:a", bitrate, str(path)],
        input=audio.T.tobytes(), check=True,
    )


def resample(audio: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Polyphase windowed-sinc resampling (scipy), (C, T) -> (C, T')."""
    if sr_in == sr_out:
        return audio
    from scipy.signal import resample_poly
    from math import gcd

    g = gcd(sr_in, sr_out)
    return resample_poly(audio, sr_out // g, sr_in // g, axis=-1).astype(np.float32)
