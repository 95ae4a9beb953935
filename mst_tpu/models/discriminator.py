"""Song-identity discriminator MLP (ref: src/model.py:545-587).

Predicts a 512-d VINet song-identity embedding from the mixing embedding;
used behind the GRL for adversarial song-identity removal.
"""

from __future__ import annotations

import flax.linen as nn
import jax


class SongIdentityDiscriminator(nn.Module):
    hidden_dim: int = 512
    output_dim: int = 512
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = nn.Dense(self.hidden_dim, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.hidden_dim, name="fc2")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.output_dim, name="fc3")(x)
