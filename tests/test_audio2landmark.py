"""Parity tests for the audio->landmark branches vs torch replicas of the
reference architecture (`model_audio2landmark.py`) with shared weights."""
import numpy as np
import jax.numpy as jnp


def _torch_content():
    import torch.nn as tnn

    class C(tnn.Module):
        def __init__(self):
            super().__init__()
            self.fc_prior = tnn.Sequential(
                tnn.Linear(80, 256), tnn.BatchNorm1d(256),
                tnn.LeakyReLU(0.2), tnn.Linear(256, 161))
            self.bilstm = tnn.LSTM(input_size=161, hidden_size=256,
                                   num_layers=3, batch_first=True)
            self.fc = tnn.Sequential(
                tnn.Linear(256 + 204, 512), tnn.BatchNorm1d(512),
                tnn.LeakyReLU(0.2), tnn.Linear(512, 256),
                tnn.BatchNorm1d(256), tnn.LeakyReLU(0.2),
                tnn.Linear(256, 204))

        def forward(self, au, face_id):
            import torch
            x = self.fc_prior(au.contiguous().view(-1, 80))
            x = x.view(-1, 18, 161)
            out, _ = self.bilstm(x)
            out = out[:, -1, :]
            if face_id.shape[0] == 1:
                face_id = face_id.repeat(out.shape[0], 1)
            return self.fc(torch.cat((out, face_id), dim=1))

    return C()


def test_content_parity(rng):
    import torch
    from animateportrait_tpu.models.audio2landmark import (
        Audio2landmarkContent, load_content_params)

    torch.manual_seed(1)
    tc_net = _torch_content()
    # randomize BN running stats so the test exercises them
    for m in tc_net.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    tc_net.eval()
    sd = {k: v.detach().numpy() for k, v in tc_net.state_dict().items()}

    au = rng.standard_normal((7, 18, 80)).astype(np.float32)
    fid = rng.standard_normal((1, 204)).astype(np.float32)

    variables = load_content_params(sd)
    out, _ = Audio2landmarkContent().apply(
        variables, jnp.asarray(au), jnp.asarray(fid))
    with torch.no_grad():
        tout = tc_net(torch.from_numpy(au), torch.from_numpy(fid))
    np.testing.assert_allclose(np.asarray(out), tout.numpy(), atol=3e-5)


def _torch_pos():
    """Replica of Audio2landmark_pos with the same state-dict key names."""
    import math
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    d_model, heads, N = 64, 2, 2

    class Embedder(tnn.Module):
        def __init__(self, i, d):
            super().__init__()
            self.embed = tnn.Linear(i, d)

        def forward(self, x):
            return self.embed(x)

    class PE(tnn.Module):
        def __init__(self, d, max_len=512):
            super().__init__()
            pe = torch.zeros(max_len, d)
            for pos in range(max_len):
                for i in range(0, d, 2):
                    pe[pos, i] = math.sin(pos / (10000 ** ((2 * i) / d)))
                    pe[pos, i + 1] = math.cos(
                        pos / (10000 ** ((2 * (i + 1)) / d)))
            self.register_buffer("pe", pe.unsqueeze(0))

        def forward(self, x):
            return x * math.sqrt(d_model) + self.pe[:, : x.size(1)]

    class MHA(tnn.Module):
        def __init__(self):
            super().__init__()
            self.q_linear = tnn.Linear(d_model, d_model)
            self.v_linear = tnn.Linear(d_model, d_model)
            self.k_linear = tnn.Linear(d_model, d_model)
            self.out = tnn.Linear(d_model, d_model)

        def forward(self, q, k, v):
            bs, dk = q.size(0), d_model // heads
            k = self.k_linear(k).view(bs, -1, heads, dk).transpose(1, 2)
            q = self.q_linear(q).view(bs, -1, heads, dk).transpose(1, 2)
            v = self.v_linear(v).view(bs, -1, heads, dk).transpose(1, 2)
            s = torch.matmul(q, k.transpose(-2, -1)) / math.sqrt(dk)
            s = F.softmax(s, dim=-1)
            o = torch.matmul(s, v).transpose(1, 2).contiguous().view(
                bs, -1, d_model)
            return self.out(o)

    class Norm(tnn.Module):
        def __init__(self):
            super().__init__()
            self.alpha = tnn.Parameter(torch.ones(d_model))
            self.bias = tnn.Parameter(torch.zeros(d_model))

        def forward(self, x):
            return self.alpha * (x - x.mean(dim=-1, keepdim=True)) / (
                x.std(dim=-1, keepdim=True) + 1e-6) + self.bias

    class FF(tnn.Module):
        def __init__(self):
            super().__init__()
            self.linear_1 = tnn.Linear(d_model, 2048)
            self.linear_2 = tnn.Linear(2048, d_model)

        def forward(self, x):
            return self.linear_2(F.relu(self.linear_1(x)))

    class EncLayer(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm_1, self.norm_2 = Norm(), Norm()
            self.attn, self.ff = MHA(), FF()

        def forward(self, x):
            x2 = self.norm_1(x)
            x = x + self.attn(x2, x2, x2)
            x2 = self.norm_2(x)
            return x + self.ff(x2)

    class Enc(tnn.Module):
        def __init__(self, in_size):
            super().__init__()
            self.embed = Embedder(in_size, d_model)
            self.pe = PE(d_model)
            self.layers = tnn.ModuleList([EncLayer() for _ in range(N)])
            self.norm = Norm()

        def forward(self, x):
            x = self.pe(self.embed(x))
            for l in self.layers:
                x = l(x)
            return self.norm(x)

    class Pos(tnn.Module):
        def __init__(self):
            super().__init__()
            self.audio_content_encoder = tnn.LSTM(
                80, 256, 3, batch_first=True)
            self.spk_emb_encoder = tnn.Sequential(
                tnn.Linear(256, 256), tnn.LeakyReLU(0.02),
                tnn.Linear(256, 128), tnn.LeakyReLU(0.02),
                tnn.Linear(128, 128))
            self.encoder = Enc(256 + 128 + 128)
            self.out = tnn.Sequential(
                tnn.Linear(d_model + 128, 512), tnn.LeakyReLU(0.02),
                tnn.Linear(512, 256), tnn.LeakyReLU(0.02),
                tnn.Linear(256, 204))

        def forward(self, au, emb, z):
            a, _ = self.audio_content_encoder(au)
            a = a[:, -1, :]
            s = self.spk_emb_encoder(emb)
            comb = torch.cat((a, s, z), dim=1)
            e = self.encoder(comb.unsqueeze(0))[0]
            e = torch.cat((e, z), dim=1)
            return self.out(e)

    return Pos()


def test_pos_parity(rng):
    import torch
    from animateportrait_tpu.models.audio2landmark import (
        Audio2landmarkPos, load_pos_params)

    torch.manual_seed(2)
    tp = _torch_pos().eval()
    sd = {k: v.detach().numpy() for k, v in tp.state_dict().items()}

    T = 24
    au = rng.standard_normal((T, 18, 80)).astype(np.float32)
    emb = np.tile(rng.standard_normal((1, 256)).astype(np.float32), (T, 1))
    z = np.zeros((T, 128), np.float32)
    fid = rng.standard_normal((1, 204)).astype(np.float32)

    variables = load_pos_params(sd)
    fl, _, spk = Audio2landmarkPos().apply(
        variables, jnp.asarray(au), jnp.asarray(emb), jnp.asarray(fid),
        jnp.asarray(z))
    with torch.no_grad():
        tfl = tp(torch.from_numpy(au), torch.from_numpy(emb),
                 torch.from_numpy(z))
    np.testing.assert_allclose(np.asarray(fl), tfl.numpy(), atol=5e-5)


def test_positional_encoding_matches_reference_loop():
    """Vectorized PE table == the reference's double loop."""
    import math
    from animateportrait_tpu.models.audio2landmark import (
        positional_encoding_table)

    d, L = 64, 16
    ours = positional_encoding_table(d, L)
    ref = np.zeros((L, d), np.float32)
    for pos in range(L):
        for i in range(0, d, 2):
            ref[pos, i] = math.sin(pos / (10000 ** ((2 * i) / d)))
            ref[pos, i + 1] = math.cos(pos / (10000 ** ((2 * (i + 1)) / d)))
    np.testing.assert_allclose(ours, ref, atol=1e-6)
