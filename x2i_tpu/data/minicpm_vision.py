"""Host-side MiniCPM-o preprocessing: adaptive slicing, SigLIP patch
packing, bucketized position ids, resampler sincos slices, whisper mel
features, and the bound->scatter-map conversion.

Mirrors /root/reference/minicpm/image_processing_minicpmv.py (best-grid
slicing at scale 448, reshape_by_patch layout; X2I inference uses
max_slice_nums=1, inference_minicpm.py:164) and
processing_minicpmo.py:105-222 (whisper features, audio placeholder math).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

MEAN = np.array([0.5, 0.5, 0.5], np.float32)
STD = np.array([0.5, 0.5, 0.5], np.float32)


def _ensure_divide(length: int, patch_size: int) -> int:
    return max(round(length / patch_size) * patch_size, patch_size)


def find_best_resize(size: Tuple[int, int], scale_resolution: int = 448,
                     patch_size: int = 14,
                     allow_upscale: bool = False) -> Tuple[int, int]:
    w, h = size
    if w * h > scale_resolution * scale_resolution or allow_upscale:
        r = w / h
        h = int(scale_resolution / math.sqrt(r))
        w = int(h * r)
    return _ensure_divide(w, patch_size), _ensure_divide(h, patch_size)


def best_slice_grid(size: Tuple[int, int], max_slice_nums: int = 9,
                    scale_resolution: int = 448,
                    never_split: bool = False) -> Optional[Tuple[int, int]]:
    """Best (cols, rows) grid (image_processing_minicpmv.py:147-296)."""
    w, h = size
    ratio = (w * h) / (scale_resolution * scale_resolution)
    multiple = min(math.ceil(ratio), max_slice_nums)
    if multiple <= 1 or never_split:
        return None
    candidates = {multiple}
    if multiple > 1:
        candidates.add(multiple - 1)
    if multiple < max_slice_nums:
        candidates.add(multiple + 1)
    candidates.discard(1)
    log_ratio = math.log(w / h)
    best, best_score = None, float("inf")
    for n in sorted(candidates):
        for m in range(1, n + 1):
            if n % m != 0:
                continue
            cols, rows = m, n // m
            score = abs(log_ratio - math.log(cols / rows))
            if score < best_score:
                best_score = score
                best = (cols, rows)
    return best


def normalize_image(img) -> np.ndarray:
    arr = np.asarray(img.convert("RGB"), np.float32) / 255.0
    return (arr - MEAN) / STD


def patchify_siglip(image, patch_size: int = 14
                    ) -> Tuple[np.ndarray, Tuple[int, int]]:
    """PIL image -> ((n_patches, 3*ps^2) flattened patches row-major,
    tgt_size (h_patches, w_patches)). Patch pixel layout (c, py, px),
    matching the SigLIP conv kernel reshape."""
    arr = normalize_image(image)                      # (H, W, 3)
    h, w = arr.shape[:2]
    gh, gw = h // patch_size, w // patch_size
    arr = arr[:gh * patch_size, :gw * patch_size]
    x = arr.transpose(2, 0, 1)                        # (3, H, W)
    x = x.reshape(3, gh, patch_size, gw, patch_size)
    x = x.transpose(1, 3, 0, 2, 4)                    # (gh, gw, 3, ps, ps)
    return x.reshape(gh * gw, -1), (gh, gw)


def bucket_position_ids(tgt_size: Tuple[int, int],
                        num_patches_per_side: int = 70) -> np.ndarray:
    """NaViT bucketized fractional ids (modeling_navit_siglip.py:333-357)."""
    gh, gw = tgt_size
    bounds = np.arange(1 / num_patches_per_side, 1.0,
                       1 / num_patches_per_side)
    fh = np.arange(0, 1 - 1e-6, 1 / gh)
    fw = np.arange(0, 1 - 1e-6, 1 / gw)
    bh = np.searchsorted(bounds, fh, side="right")
    bw = np.searchsorted(bounds, fw, side="right")
    return (bh[:, None] * num_patches_per_side + bw[None, :]).reshape(-1)


def slice_image(image, max_slice_nums: int = 9, scale_resolution: int = 448,
                patch_size: int = 14) -> List:
    """Adaptive slicing: source image + grid slices (or just the resized
    image when the grid is None / max_slice_nums==1)."""
    from PIL import Image as PILImage
    grid = best_slice_grid(image.size, max_slice_nums, scale_resolution)
    if max_slice_nums == 1 or grid is None:
        w, h = find_best_resize(image.size, scale_resolution, patch_size,
                                allow_upscale=True)
        return [image.resize((w, h), PILImage.BICUBIC)]
    # source image at best resize + slice tiles
    bw, bh = find_best_resize(image.size, scale_resolution, patch_size)
    out = [image.resize((bw, bh), PILImage.BICUBIC)]
    cols, rows = grid
    rw = _ensure_divide(int(image.size[0] / cols), patch_size)
    rh = _ensure_divide(int(image.size[1] / rows), patch_size)
    refined = image.resize((rw * cols, rh * rows), PILImage.BICUBIC)
    for r in range(rows):
        for c in range(cols):
            out.append(refined.crop((c * rw, r * rh, (c + 1) * rw,
                                     (r + 1) * rh)))
    return out


def prepare_minicpm_vision(images: Sequence, llm_hidden: int,
                           max_slice_nums: int = 1, patch_size: int = 14,
                           num_patches_per_side: int = 70,
                           max_size: int = 70,
                           scale_resolution: int = 448) -> Optional[Dict]:
    """images -> padded arrays for MiniCPMOEncoder.encode_images. Each
    image may expand to several slices; all slices are padded to the max
    patch count."""
    from x2i_tpu.models.resampler import get_2d_sincos_pos_embed

    slices = []
    for im in images or []:
        slices.extend(slice_image(im, max_slice_nums,
                                  scale_resolution=scale_resolution,
                                  patch_size=patch_size))
    if not slices:
        return None
    packed = [patchify_siglip(s, patch_size) for s in slices]
    max_len = max(p.shape[0] for p, _ in packed)
    n = len(packed)
    patch_dim = packed[0][0].shape[1]
    patches = np.zeros((n, max_len, patch_dim), np.float32)
    pos_ids = np.zeros((n, max_len), np.int32)
    mask = np.zeros((n, max_len), bool)
    pos_embed = np.zeros((n, max_len, llm_hidden), np.float32)
    table = get_2d_sincos_pos_embed(llm_hidden, max_size, max_size)
    tgt_sizes = []
    for i, (p, (gh, gw)) in enumerate(packed):
        L = p.shape[0]
        patches[i, :L] = p
        pos_ids[i, :L] = bucket_position_ids((gh, gw), num_patches_per_side)
        mask[i, :L] = True
        pos_embed[i, :L] = table[:gh, :gw].reshape(gh * gw, -1)
        tgt_sizes.append((gh, gw))
    return {"patches": patches, "position_ids": pos_ids,
            "patch_mask": mask, "pos_embed": pos_embed,
            "tgt_sizes": tgt_sizes, "num_slices": n}


def bounds_to_map(bounds: Sequence[Sequence[Tuple[int, int]]],
                  seq_len: int,
                  rows: Optional[np.ndarray] = None) -> np.ndarray:
    """Per-sample [(start, end), ...] spans -> (B, S) int32 map with the
    flat feature row per position, -1 elsewhere (get_vllm_embedding's
    scatter, modeling_minicpmo.py:380-406).

    rows: optional explicit flat feature-row indices consumed in span
    order — used when the flat feature tensor has padded rows that must
    be skipped (multi-chunk audio: each mel chunk's pooled tail is pad,
    get_omni_embedding concatenates only the valid rows, :585-599)."""
    b = len(bounds)
    out = np.full((b, seq_len), -1, np.int32)
    row = 0
    for i, spans in enumerate(bounds):
        for (st, ed) in spans:
            n = ed - st
            if rows is not None:
                out[i, st:ed] = np.asarray(rows[row:row + n], np.int32)
            else:
                out[i, st:ed] = np.arange(row, row + n)
            row += n
    if rows is not None and row != len(rows):
        raise ValueError(f"span total {row} != feature rows {len(rows)}")
    return out


# ---- whisper mel features (processing_minicpmo.py WhisperFeatureExtractor
# equivalent) ----

def mel_filterbank(sr: int = 16000, n_fft: int = 400,
                   n_mels: int = 80) -> np.ndarray:
    """Slaney-style mel filterbank (HF WhisperFeatureExtractor default)."""
    def hz_to_mel(f):
        f = np.asarray(f, np.float32)
        mel = 3.0 * f / 200.0
        log_region = f >= 1000.0
        mel = np.where(log_region,
                       15.0 + np.log(np.maximum(f, 1e-10) / 1000.0)
                       / np.log(6.4) * 27.0, mel)
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, np.float32)
        f = 200.0 * m / 3.0
        log_region = m >= 15.0
        f = np.where(log_region, 1000.0 * np.exp(np.log(6.4) / 27.0
                                                 * (m - 15.0)), f)
        return f

    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_pts = np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    fb = np.zeros((n_mels, n_fft // 2 + 1), np.float32)
    for i in range(n_mels):
        lower = (fft_freqs - hz_pts[i]) / max(hz_pts[i + 1] - hz_pts[i],
                                              1e-10)
        upper = (hz_pts[i + 2] - fft_freqs) / max(
            hz_pts[i + 2] - hz_pts[i + 1], 1e-10)
        fb[i] = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])
    return fb * enorm[:, None]


def log_mel_spectrogram(audio: np.ndarray, sr: int = 16000,
                        n_fft: int = 400, hop: int = 160,
                        n_mels: int = 80,
                        chunk_seconds: float = 30.0) -> np.ndarray:
    """float waveform -> (n_mels, T) whisper-style log-mel, padded/cut to
    one 30s chunk (processing_minicpmo.py:183-191 chunks long audio)."""
    target = int(sr * chunk_seconds)
    audio = np.asarray(audio, np.float32)[:target]
    audio = np.pad(audio, (0, target - len(audio)))
    # whisper STFT: centered with reflect padding; last frame dropped
    pad = n_fft // 2
    padded = np.pad(audio, (pad, pad), mode="reflect")
    window = np.hanning(n_fft + 1)[:-1].astype(np.float32)
    frames = 1 + len(audio) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(frames)[:, None]
    stft = np.fft.rfft(padded[idx] * window, axis=-1)
    power = (np.abs(stft) ** 2)[:-1]                 # (T, n_fft/2+1)
    mel = mel_filterbank(sr, n_fft, n_mels) @ power.T
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)


def audio_placeholder_len(samples: int, sr: int = 16000, hop: int = 160,
                          pool_step: int = 2) -> int:
    """Number of LLM tokens an audio clip occupies: STFT frame count,
    conv stride 2, then avg-pool — the exact reference formula
    (processing_minicpmo.py:105-110: feature_lens = ceil(len/hop);
    (feature_lens-1)//2+1; (x-pool)//pool+1)."""
    feature_lens = math.ceil(samples / hop)
    after_conv = (feature_lens - 1) // 2 + 1
    return (after_conv - pool_step) // pool_step + 1


def audio_placeholder_spans(samples: int, chunk_length: float = 1.0,
                            sr: int = 16000, hop: int = 160,
                            pool_step: int = 2) -> List[int]:
    """chunk_input=True placeholder spans: the total token budget split
    into per-`chunk_length`-second runs, each wrapped in its own
    <audio>...</audio> pair (processing_minicpmo.py:111-122; X2I passes
    chunk_input=True, inference_minicpm.py:166)."""
    output_lens = audio_placeholder_len(samples, sr, hop, pool_step)
    fbank_per_chunk = int(chunk_length * 100)
    cnn_per_chunk = (fbank_per_chunk - 1) // 2 + 1
    per_chunk = (cnn_per_chunk - pool_step) // pool_step + 1
    spans = []
    total = 0
    while total < output_lens:
        n = min(per_chunk, output_lens - total)
        spans.append(n)
        total += n
    return spans


def chunk_audio_mels(audio: np.ndarray, sr: int = 16000,
                     n_fft: int = 400, hop: int = 160, n_mels: int = 80,
                     chunk_seconds: float = 30.0
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Long-audio feature extraction: split >30s audio into consecutive
    30s chunks (processing_minicpmo.py:183-191), compute each chunk's mel
    over the full zero-padded 30s window (the log normalization sees the
    padded spectrogram, as HF WhisperFeatureExtractor does), truncate to
    the valid frame count ceil(len/hop) (:199-206 feat[:, :lens]), and
    zero-pad to the longest chunk (pad_sequence, :215-218).

    -> (mels (A, n_mels, T_max) f32, lens (A,) int32 valid frames/chunk).
    """
    audio = np.asarray(audio, np.float32)
    max_len = int(sr * chunk_seconds)
    n_chunks = max(1, math.ceil(len(audio) / max_len))
    chunks = [audio[i * max_len:(i + 1) * max_len] for i in range(n_chunks)]
    lens = np.array([math.ceil(len(c) / hop) for c in chunks], np.int32)
    t_max = int(lens.max())
    mels = np.zeros((n_chunks, n_mels, t_max), np.float32)
    for i, (c, ln) in enumerate(zip(chunks, lens)):
        full = log_mel_spectrogram(c, sr, n_fft, hop, n_mels, chunk_seconds)
        mels[i, :, :ln] = full[:, :ln]
    return mels, lens
