"""Torch replica of the reference encoder, for parity testing + CPU baseline.

Reimplements the architecture described in SURVEY.md §2.1 (ref:
src/model.py:17-542) with the reference's exact module names, so its
``state_dict()`` has the same keys as a real reference checkpoint and
``mst_tpu.checkpoints.torch_compat`` can be tested end-to-end without the
(unshipped) trained weights.  Test infrastructure only.
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from mst_tpu.ops.mel import _mel_fb_np


class TorchMel(nn.Module):
    """torchaudio.MelSpectrogram equivalent via torch.stft + HTK fb."""

    def __init__(self, sr, n_fft, hop, n_mels):
        super().__init__()
        self.n_fft, self.hop = n_fft, hop
        self.register_buffer("fb", torch.from_numpy(_mel_fb_np(n_fft // 2 + 1, n_mels, sr)))
        self.register_buffer("win", torch.hann_window(n_fft))

    def forward(self, x):  # (..., T) -> (..., n_mels, F)
        shape = x.shape
        spec = torch.stft(x.reshape(-1, shape[-1]), self.n_fft, self.hop,
                          window=self.win, center=True, pad_mode="reflect",
                          return_complex=True)
        power = spec.abs() ** 2
        mel = torch.einsum("bft,fm->bmt", power, self.fb)
        return mel.reshape(*shape[:-1], mel.shape[-2], mel.shape[-1])


class TorchSubBandCNN(nn.Module):
    def __init__(self, split_size, channels, out_channels=64):
        super().__init__()
        sub = max(1, split_size // 10)
        self.conv1 = nn.Conv2d(channels, 32, 7, padding=3)
        self.bn1 = nn.BatchNorm2d(32)
        self.pool1 = nn.MaxPool2d((sub, 5))
        self.conv2 = nn.Conv2d(32, out_channels, 7, padding=3)
        self.bn2 = nn.BatchNorm2d(out_channels)
        self.pool2 = nn.MaxPool2d((4, 4))

    def forward(self, x, g1=None, b1=None, g2=None, b2=None):
        x = self.bn1(self.conv1(x))
        if g1 is not None:
            x = g1[:, :, None, None] * x + b1[:, :, None, None]
        x = self.pool1(F.relu(x))
        x = self.bn2(self.conv2(x))
        if g2 is not None:
            x = g2[:, :, None, None] * x + b2[:, :, None, None]
        x = self.pool2(F.relu(x))
        return x


class TorchAttentionPooling(nn.Module):
    def __init__(self, input_dim, hidden_dim, output_dim):
        super().__init__()
        self.attention = nn.Sequential(
            nn.Linear(input_dim, hidden_dim), nn.Tanh(), nn.Linear(hidden_dim, 1)
        )
        self.projection = nn.Sequential(
            nn.Linear(input_dim, output_dim), nn.ReLU(), nn.Dropout(0.3)
        )

    def forward(self, x):  # (B, C, T)
        x = x.transpose(1, 2)
        w = F.softmax(self.attention(x), dim=1)
        return self.projection((x * w).sum(dim=1))


class TorchBandSplitEncoder(nn.Module):
    def __init__(self, sr, n_fft, hop, n_mels, split_size, overlap,
                 channels, embed_dim, clip_seconds=10.0):
        super().__init__()
        self.split_size, self.overlap = split_size, overlap
        self.mel = TorchMel(sr, n_fft, hop, n_mels)
        self.n_subbands = 0
        i = 0
        while overlap * i <= n_mels - split_size:
            self.n_subbands += 1
            i += 1
        self.subnet_cnns = nn.ModuleList(
            [TorchSubBandCNN(split_size, channels) for _ in range(self.n_subbands)]
        )
        frames = int(clip_seconds * sr) // hop + 1
        with torch.no_grad():
            d = self.subnet_cnns[0](torch.zeros(1, channels, split_size, frames))
        total = 64 * self.n_subbands * d.shape[2]
        self.attention_pooling = TorchAttentionPooling(total, 256, embed_dim)

    def forward(self, stems, film=None):  # stems (B, 4, 2, T)
        B = stems.shape[0]
        mel = self.mel(stems)  # (B, 4, 2, M, F)
        x = torch.log(mel.reshape(B, 8, mel.shape[-2], mel.shape[-1]) + 1e-10)
        feats = []
        for i, net in enumerate(self.subnet_cnns):
            s = i * self.overlap
            band = x[:, :, s : s + self.split_size, :]
            if film is not None:
                g1, b1, g2, b2 = (f[:, i] for f in film)
            else:
                g1 = b1 = g2 = b2 = None
            feats.append(net(band, g1, b1, g2, b2))
        cat = torch.cat(feats, dim=1)  # (B, nb*C, F', T')
        B_, C_, F_, T_ = cat.shape
        return self.attention_pooling(cat.reshape(B_, C_ * F_, T_))


class TorchMixingFeatureEncoder(nn.Module):
    def __init__(self, feature_dim, n_subbands, hidden_dim=256):
        super().__init__()
        self.n_subbands = n_subbands
        self.feature_mlp = nn.Sequential(
            nn.Linear(feature_dim, hidden_dim), nn.ReLU(), nn.Dropout(0.2),
            nn.Linear(hidden_dim, hidden_dim), nn.ReLU(),
        )
        self.film_head = nn.Linear(hidden_dim, n_subbands * (32 + 32 + 64 + 64))

    def forward(self, feats):
        flat = self.film_head(self.feature_mlp(feats))
        flat = flat.reshape(-1, self.n_subbands, 192)
        return (flat[..., :32], flat[..., 32:64], flat[..., 64:128], flat[..., 128:])


class TorchMixingStyleEncoder(nn.Module):
    def __init__(self, sr=44100, n_fft=1024, hop=256, n_mels=128,
                 split_size=20, overlap=10, embed_dim=768, feature_dim=64,
                 clip_seconds=10.0):
        super().__init__()
        self.audio_encoder = TorchBandSplitEncoder(
            sr, n_fft, hop, n_mels, split_size, overlap, 8, embed_dim, clip_seconds
        )
        self.film_encoder = TorchMixingFeatureEncoder(
            feature_dim, self.audio_encoder.n_subbands
        )

    def forward(self, stems, feats):
        film = self.film_encoder(feats)
        return self.audio_encoder(stems, film)
