"""Numerical parity against torch oracles: LSTM/GRU cells with copied weights.

The reference's encoders are ``torch.nn.LSTM``/``GRU``; these tests copy a
torch module's weights into our scan-based cells and require matching outputs
— the strongest evidence that the TPU rebuild computes the same function.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.models.encoders import (  # noqa: E402
    SequenceEncoder,
)

B, T, D, H = 3, 11, 5, 8


def _copy_rnn_weights(torch_rnn, num_layers):
    """torch [(4H,D) etc.] -> our [(D,4H)] transposed layout."""
    params = {}
    for layer in range(num_layers):
        params[f"weight_ih_l{layer}"] = jnp.asarray(
            getattr(torch_rnn, f"weight_ih_l{layer}").detach().numpy().T
        )
        params[f"weight_hh_l{layer}"] = jnp.asarray(
            getattr(torch_rnn, f"weight_hh_l{layer}").detach().numpy().T
        )
        params[f"bias_ih_l{layer}"] = jnp.asarray(
            getattr(torch_rnn, f"bias_ih_l{layer}").detach().numpy()
        )
        params[f"bias_hh_l{layer}"] = jnp.asarray(
            getattr(torch_rnn, f"bias_hh_l{layer}").detach().numpy()
        )
    return params


@pytest.mark.parametrize("cell,num_layers", [
    ("lstm", 1), ("lstm", 2), ("gru", 1), ("gru", 2),
])
def test_rnn_matches_torch(cell, num_layers):
    torch.manual_seed(0)
    torch_cls = torch.nn.LSTM if cell == "lstm" else torch.nn.GRU
    torch_rnn = torch_cls(D, H, num_layers=num_layers, batch_first=True)
    x = np.random.default_rng(0).standard_normal((B, T, D)).astype(np.float32)

    with torch.no_grad():
        _, hidden = torch_rnn(torch.tensor(x))
    h_n = hidden[0] if cell == "lstm" else hidden
    want = h_n[-1].numpy()  # final hidden state of the last layer

    enc = SequenceEncoder(
        hidden_dim=H, output_dim=H, num_layers=num_layers,
        encoder_type=cell, dropout=0.0,
    )
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = dict(variables["params"])
    params["rnn"] = _copy_rnn_weights(torch_rnn, num_layers)
    # identity projection so the encoder output IS the final hidden state
    params["projection"] = {
        "kernel": jnp.eye(H, dtype=jnp.float32),
        "bias": jnp.zeros((H,), jnp.float32),
    }
    got = np.asarray(enc.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_lstm_packed_lengths_match_torch():
    """Carry-freeze semantics == torch pack_padded_sequence final states."""
    torch.manual_seed(1)
    torch_rnn = torch.nn.LSTM(D, H, num_layers=1, batch_first=True)
    x = np.random.default_rng(1).standard_normal((B, T, D)).astype(np.float32)
    lengths = np.array([T, 4, 7])

    with torch.no_grad():
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            torch.tensor(x), torch.tensor(lengths), batch_first=True,
            enforce_sorted=False,
        )
        _, (h_n, _) = torch_rnn(packed)
    want = h_n[-1].numpy()

    enc = SequenceEncoder(
        hidden_dim=H, output_dim=H, num_layers=1, encoder_type="lstm", dropout=0.0
    )
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = dict(variables["params"])
    params["rnn"] = _copy_rnn_weights(torch_rnn, 1)
    params["projection"] = {
        "kernel": jnp.eye(H, dtype=jnp.float32),
        "bias": jnp.zeros((H,), jnp.float32),
    }
    got = np.asarray(
        enc.apply({"params": params}, jnp.asarray(x), jnp.asarray(lengths))
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_lstm_grad_matches_torch():
    """GRADIENT parity (round-5 verdict ask #3): forward parity does not
    cover training dynamics — backprop through the scan LSTM must match
    torch autograd on inputs AND every weight."""
    torch.manual_seed(2)
    torch_rnn = torch.nn.LSTM(D, H, num_layers=1, batch_first=True)
    x = np.random.default_rng(2).standard_normal((B, T, D)).astype(np.float32)

    xt = torch.tensor(x, requires_grad=True)
    _, (h_n, _) = torch_rnn(xt)
    loss_t = h_n[-1].square().sum()
    loss_t.backward()
    want_dx = xt.grad.numpy()
    want_dw = {
        name: getattr(torch_rnn, name).grad.numpy()
        for name in ("weight_ih_l0", "weight_hh_l0", "bias_ih_l0", "bias_hh_l0")
    }

    enc = SequenceEncoder(
        hidden_dim=H, output_dim=H, num_layers=1, encoder_type="lstm", dropout=0.0
    )
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = dict(variables["params"])
    params["rnn"] = _copy_rnn_weights(torch_rnn, 1)
    params["projection"] = {
        "kernel": jnp.eye(H, dtype=jnp.float32),
        "bias": jnp.zeros((H,), jnp.float32),
    }

    def loss_fn(p, xin):
        out = enc.apply({"params": p}, xin)
        return jnp.sum(out**2)

    (dp, dx) = jax.grad(loss_fn, argnums=(0, 1))(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(dx), want_dx, rtol=1e-4, atol=1e-5)
    for name in want_dw:
        got = np.asarray(dp["rnn"][name])
        want = want_dw[name]
        if name.startswith("weight"):
            want = want.T  # our layout is torch's transposed
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5, err_msg=name)


def test_grouped_lstm_grad_matches_torch():
    """GRADIENT parity through the stacked GroupedRNNEncoder scan — the
    flagship's LSTM training path (models/grouped.py): each group member's
    input/weight gradients must equal an independent torch LSTM's."""
    from multimodal_sensor_fusion_with_attention_rajeevatla_tpu.models.grouped import (
        GroupedRNNEncoder,
    )

    G = 3
    torch.manual_seed(3)
    torch_rnns = [
        torch.nn.LSTM(D, H, num_layers=1, batch_first=True) for _ in range(G)
    ]
    x = np.random.default_rng(3).standard_normal((G, B, T, D)).astype(np.float32)

    want_dx, want_dw = [], []
    for g, rnn in enumerate(torch_rnns):
        xt = torch.tensor(x[g], requires_grad=True)
        _, (h_n, _) = rnn(xt)
        h_n[-1].square().sum().backward()
        want_dx.append(xt.grad.numpy())
        want_dw.append({
            name: getattr(rnn, name).grad.numpy()
            for name in ("weight_ih_l0", "weight_hh_l0", "bias_ih_l0", "bias_hh_l0")
        })

    enc = GroupedRNNEncoder(
        num_groups=G, hidden_dim=H, output_dim=H, num_layers=1,
        cell_type="lstm", dropout=0.0,
    )
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = dict(variables["params"])
    for name in ("weight_ih_l0", "weight_hh_l0"):
        params[name] = jnp.stack(
            [jnp.asarray(getattr(r, name).detach().numpy().T) for r in torch_rnns]
        )
    for name in ("bias_ih_l0", "bias_hh_l0"):
        params[name] = jnp.stack(
            [jnp.asarray(getattr(r, name).detach().numpy()) for r in torch_rnns]
        )
    params["proj_kernel"] = jnp.stack([jnp.eye(H, dtype=jnp.float32)] * G)
    params["proj_bias"] = jnp.zeros((G, H), jnp.float32)

    def loss_fn(p, xin):
        out = enc.apply({"params": p}, xin)  # [G, B, H]
        return jnp.sum(out**2)

    (dp, dx) = jax.grad(loss_fn, argnums=(0, 1))(params, jnp.asarray(x))
    for g in range(G):
        np.testing.assert_allclose(
            np.asarray(dx[g]), want_dx[g], rtol=1e-4, atol=1e-5,
            err_msg=f"input grad, group {g}",
        )
        for name, want in want_dw[g].items():
            got = np.asarray(dp[name][g])
            if name.startswith("weight"):
                want = want.T
            np.testing.assert_allclose(
                got, want, rtol=1e-4, atol=1e-5, err_msg=f"{name}, group {g}"
            )
