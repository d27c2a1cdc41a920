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
