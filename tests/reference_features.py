"""Torch replica of the reference's MixingFeatureExtractor formulas.

Used only as a golden oracle for tests: reproduces src/mixing_utils.py:16-357
semantics with torch.stft + the same HTK filterbank (torchaudio's
MelSpectrogram is exactly torch.stft power + that filterbank).  NOT part of
the framework.
"""

import numpy as np
import torch

from mst_tpu.ops.mel import _mel_fb_np

STEMS = ("vocals", "bass", "drums", "other")


class RefFeatureExtractor:
    def __init__(self, sample_rate=44100, n_fft=1024, hop_length=256, n_mels=128,
                 use_detailed_spectral=False, n_spectral_bins=32):
        self.sr = sample_rate
        self.n_fft = n_fft
        self.hop = hop_length
        self.n_mels = n_mels
        self.use_detailed_spectral = use_detailed_spectral
        self.n_spectral_bins = n_spectral_bins
        self.fb = torch.from_numpy(
            _mel_fb_np(n_fft // 2 + 1, n_mels, sample_rate)
        )

    def mel(self, audio):  # (C, T) -> (C, n_mels, F)
        w = torch.hann_window(self.n_fft)
        spec = torch.stft(audio, self.n_fft, self.hop, window=w, center=True,
                          pad_mode="reflect", return_complex=True)
        power = spec.abs() ** 2  # (C, freq, F)
        return torch.einsum("cft,fm->cmt", power, self.fb)

    def loudness(self, audio):
        rms = torch.sqrt(torch.mean(audio**2))
        return -0.691 + 10 * torch.log10(rms**2 + 1e-10)

    def dynamics(self, audio):
        rms = torch.sqrt(torch.mean(audio**2, dim=-1))
        peak = torch.max(torch.abs(audio), dim=-1)[0]
        crest = 20 * torch.log10(peak / (rms + 1e-8))
        loud = self.loudness(audio)
        return torch.cat([rms, crest, torch.tensor([loud, loud])])

    def spectral(self, audio):
        mel_spec = self.mel(audio)
        mel_db = 10 * torch.log10(mel_spec + 1e-10)
        mel_energy = mel_db.mean(dim=(0, 2))
        if self.use_detailed_spectral:
            # ref: mixing_utils.py:202-236
            if self.n_spectral_bins >= self.n_mels:
                curve = mel_energy
                nb = self.n_mels
            else:
                curve = torch.nn.functional.interpolate(
                    mel_energy.unsqueeze(0).unsqueeze(0),
                    size=self.n_spectral_bins, mode="linear",
                    align_corners=True,
                ).squeeze()
                nb = self.n_spectral_bins
            bins = torch.arange(nb, dtype=torch.float32)
            if curve.std() < 1e-6:
                tilt = torch.tensor(0.0)
            else:
                tilt = torch.corrcoef(torch.stack([bins, curve]))[0, 1]
            flat = torch.exp(torch.mean(torch.log(mel_spec + 1e-10))) / (
                torch.mean(mel_spec) + 1e-10
            )
            return torch.cat([curve, torch.tensor([tilt, flat])])
        lo = self.n_mels // 4
        hi = self.n_mels // 4 * 3
        low_e = mel_energy[:lo].mean()
        mid_e = mel_energy[lo:hi].mean()
        high_e = mel_energy[hi:].mean()
        bins = torch.arange(self.n_mels, dtype=torch.float32)
        if mel_energy.std() < 1e-6:
            tilt = torch.tensor(0.0)
        else:
            tilt = torch.corrcoef(torch.stack([bins, mel_energy]))[0, 1]
        flat = torch.exp(torch.mean(torch.log(mel_spec + 1e-10))) / (
            torch.mean(mel_spec) + 1e-10
        )
        return torch.tensor([low_e, mid_e, high_e, tilt, flat])

    def stereo(self, audio):
        L, R = audio[0], audio[1]
        rms_L = torch.sqrt(torch.mean(L**2))
        rms_R = torch.sqrt(torch.mean(R**2))
        ild = 20 * torch.log10(rms_L / (rms_R + 1e-8))
        Lc, Rc = L - L.mean(), R - R.mean()
        corr = (Lc * Rc).sum() / (torch.sqrt((Lc**2).sum() * (Rc**2).sum()) + 1e-8)
        mid, side = (L + R) / 2, (L - R) / 2
        msr = torch.mean(side**2) / (torch.mean(mid**2) + 1e-8)
        return torch.tensor([ild, corr, msr])

    def masking(self, stems):
        mels = {k: self.mel(v).mean(dim=0) for k, v in stems.items()}
        out = []
        for i, name in enumerate(STEMS):
            others = [mels[n] for j, n in enumerate(STEMS) if j != i]
            max_other = torch.stack(others).max(dim=0)[0]
            dom = mels[name] - max_other
            out.append(torch.sigmoid(-dom).mean())
        return torch.stack(out)

    def extract(self, stems):
        """stems: dict name -> (2, T) torch tensor; returns (64,) numpy."""
        feats = {}
        mixture = sum(stems.values())
        for name, a in stems.items():
            feats[f"{name}_dynamics"] = self.dynamics(a)
            feats[f"{name}_spectral"] = self.spectral(a)
            feats[f"{name}_stereo"] = self.stereo(a)
        mix_loud = self.loudness(mixture)
        for name, a in stems.items():
            feats[f"{name}_rel_loudness"] = (self.loudness(a) - mix_loud).reshape(1)
        feats["masking"] = self.masking(stems)
        vec = torch.cat([feats[k].flatten() for k in sorted(feats.keys())])
        vec = torch.clamp(vec, -100.0, 100.0)
        vec = torch.where(torch.isnan(vec), torch.zeros_like(vec), vec)
        return vec.numpy()
