"""AutoVC generator parity vs a torch replica of the reference architecture
(`model_vc_37_1.py`) with shared random weights — validates both the Flax
architecture and the state-dict converter."""
import numpy as np
import jax.numpy as jnp


def _torch_autovc(dim_neck=16, dim_emb=256, freq=16):
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    class CN(tnn.Module):
        """ConvNorm-shaped wrapper so state-dict keys match the reference."""

        def __init__(self, i, o):
            super().__init__()
            self.conv = tnn.Conv1d(i, o, 5, padding=2)

        def forward(self, x):
            return self.conv(x)

    class Enc(tnn.Module):
        def __init__(self):
            super().__init__()
            self.convolutions = tnn.ModuleList([
                tnn.Sequential(
                    CN(80 + dim_emb if i == 0 else 512, 512),
                    tnn.GroupNorm(32, 512))
                for i in range(3)])
            self.lstm = tnn.LSTM(512, dim_neck, 2, batch_first=True,
                                 bidirectional=True)

        def forward(self, x):
            for conv in self.convolutions:
                x = F.relu(conv(x))
            x = x.transpose(1, 2)
            out, _ = self.lstm(x)
            f, b = out[:, :, :dim_neck], out[:, :, dim_neck:]
            codes = []
            for i in range(0, out.size(1), freq):
                codes.append(torch.cat(
                    (f[:, i + freq - 1, :], b[:, i, :]), dim=-1))
            return codes

    class Dec(tnn.Module):
        def __init__(self):
            super().__init__()
            self.lstm = tnn.LSTM(dim_neck * 2 + dim_emb + 257, 512, 3,
                                 batch_first=True)
            class LN(tnn.Module):
                def __init__(self):
                    super().__init__()
                    self.linear_layer = tnn.Linear(512, 80)

                def forward(self, x):
                    return self.linear_layer(x)

            self.linear_projection = LN()

        def forward(self, x):
            out, _ = self.lstm(x)
            return self.linear_projection.linear_layer(out)

    class Post(tnn.Module):
        def __init__(self):
            super().__init__()
            chans = [(80, 512), (512, 512), (512, 512), (512, 512), (512, 80)]
            self.convolutions = tnn.ModuleList([
                tnn.Sequential(
                    CN(i, o), tnn.GroupNorm(32 if o == 512 else 5, o))
                for i, o in chans])

        def forward(self, x):
            for c in self.convolutions[:-1]:
                x = torch.tanh(c(x))
            return self.convolutions[-1](x)

    class Gen(tnn.Module):
        def __init__(self):
            super().__init__()
            self.encoder, self.decoder, self.postnet = Enc(), Dec(), Post()

        def forward(self, x, c_org, c_trg, f0_trg):
            x = x.transpose(2, 1)
            c = c_org.unsqueeze(-1).expand(-1, -1, x.size(-1))
            codes = self.encoder(torch.cat((x, c), dim=1))
            tmp = [cd.unsqueeze(1).expand(-1, freq, -1) for cd in codes]
            code_exp = torch.cat(tmp, dim=1)
            enc_out = torch.cat(
                (code_exp, c_trg.unsqueeze(1).expand(-1, x.size(-1), -1),
                 f0_trg), dim=-1)
            mel = self.decoder(enc_out)
            post = self.postnet(mel.transpose(2, 1))
            return mel, mel + post.transpose(2, 1)

    # rename state-dict keys to the reference's `...{i}.0.conv.weight` form
    g = Gen().eval()
    return g


def test_autovc_forward_parity(rng):
    import torch
    from animateportrait_tpu.models.autovc import (
        AutoVCGenerator, load_autovc_params)

    torch.manual_seed(0)
    tg = _torch_autovc()
    sd = {k: v.detach().numpy() for k, v in tg.state_dict().items()}

    B, T = 2, 64
    mel = rng.standard_normal((B, T, 80)).astype(np.float32)
    spk = rng.standard_normal((B, 256)).astype(np.float32)
    f0 = np.zeros((B, T, 257), np.float32)
    f0[:, :, rng.integers(0, 257)] = 1.0

    params = load_autovc_params(sd)
    mel_dec, mel_post, codes = AutoVCGenerator().apply(
        params, jnp.asarray(mel), jnp.asarray(spk), jnp.asarray(spk),
        jnp.asarray(f0))

    with torch.no_grad():
        tmel, tpost = tg(torch.from_numpy(mel), torch.from_numpy(spk),
                         torch.from_numpy(spk), torch.from_numpy(f0))
    np.testing.assert_allclose(np.asarray(mel_dec), tmel.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(mel_post), tpost.numpy(), atol=3e-5)
