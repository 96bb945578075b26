"""VoiceEncoder parity vs a torch replica of resemblyzer's architecture."""
import numpy as np
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp


def test_voice_encoder_parity(rng):
    from animateportrait_tpu.models.speaker_encoder import (
        VoiceEncoder, load_voice_encoder_params)

    class TVE(tnn.Module):
        def __init__(self):
            super().__init__()
            self.lstm = tnn.LSTM(40, 256, 3, batch_first=True)
            self.linear = tnn.Linear(256, 256)
            self.relu = tnn.ReLU()

        def forward(self, mels):
            _, (h, _) = self.lstm(mels)
            raw = self.relu(self.linear(h[-1]))
            return raw / torch.norm(raw, dim=1, keepdim=True).clamp(min=1e-8)

    torch.manual_seed(11)
    tv = TVE().eval()
    sd = {k: v.detach().numpy() for k, v in tv.state_dict().items()}
    mels = rng.standard_normal((2, 50, 40)).astype(np.float32)
    variables = load_voice_encoder_params(sd)
    ours = VoiceEncoder().apply(variables, jnp.asarray(mels))
    with torch.no_grad():
        ref = tv(torch.from_numpy(mels))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5)


def test_embed_utterance_smoke(rng):
    from animateportrait_tpu.models.speaker_encoder import (
        VoiceEncoder, embed_utterance, get_spk_emb)

    v = VoiceEncoder().init(jax.random.key(0), jnp.zeros((1, 160, 40)))
    wav = rng.standard_normal(16000 * 2).astype(np.float64) * 0.1
    e = embed_utterance(v, wav)
    assert e.shape == (256,)
    np.testing.assert_allclose(np.linalg.norm(e), 1.0, atol=1e-5)
    e2 = get_spk_emb(v, wav)
    assert e2.shape == (256,)
