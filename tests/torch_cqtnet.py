"""Torch CQTNet replica used as the golden oracle for converter parity.

Re-derived from the published CQTNet topology (Yu et al. 2020) in the
Discogs-VINet configuration the reference loads
(ref: scripts/extract_song_identity_embeddings.py:37-58).  Layers are
registered in nn.Sequential order so the state_dict has the positional key
layout the order-and-shape converter
(mst_tpu.checkpoints.cqtnet_params_from_torch) expects from upstream.
"""

import torch
import torch.nn as nn


class TorchCQTNet(nn.Module):
    def __init__(self, ch_in: int = 40, ch_out: int = 512):
        super().__init__()
        c = ch_in
        spec = [
            # (in, out, kernel, dilation, padding, pool_after)
            (1, c, (12, 3), (1, 1), (6, 0), False),
            (c, 2 * c, (13, 3), (1, 2), (0, 0), True),
            (2 * c, 2 * c, (13, 3), (1, 1), (0, 0), False),
            (2 * c, 2 * c, (3, 3), (1, 2), (0, 0), True),
            (2 * c, 4 * c, (3, 3), (1, 1), (0, 0), False),
            (4 * c, 4 * c, (3, 3), (1, 2), (0, 0), True),
            (4 * c, 8 * c, (3, 3), (1, 1), (0, 0), False),
            (8 * c, 8 * c, (3, 3), (1, 2), (0, 0), True),
            (8 * c, 16 * c, (3, 3), (1, 1), (0, 0), False),
            (16 * c, 16 * c, (3, 3), (1, 2), (0, 0), False),
        ]
        layers = []
        for cin, cout, k, d, p, pool in spec:
            layers += [
                nn.Conv2d(cin, cout, k, dilation=d, padding=p, bias=False),
                nn.BatchNorm2d(cout),
                nn.ReLU(inplace=True),
            ]
            if pool:
                layers.append(nn.MaxPool2d((1, 2), stride=(1, 2), padding=(0, 1)))
        self.features = nn.Sequential(*layers)
        self.pool = nn.AdaptiveMaxPool2d((1, 1))
        self.projection = nn.Linear(16 * c, ch_out)

    def forward(self, x):  # (B, 1, n_bins, frames)
        h = self.features(x)
        h = self.pool(h).flatten(1)
        e = self.projection(h)
        return e / e.norm(dim=1, keepdim=True).clamp_min(1e-12)
