"""Sublayer-level drift drill: which half of fused layer 0 diverges?

Every primitive matched bitwise in isolation (docs/
fused_drift_components.json), so the drift must enter at graph level.
Using real toy layer-0 weights and the real embedded activations:

  attn_half — fused layer with alpha_ffn := 0 reduces to the attention
      sublayer + residual; compare vs the XLA graph's
      self_attention_layer_0 output.
  ffn_half  — fused layer with alpha_attn := 0 applied to the XLA
      attention output reduces to the FFN sublayer + residual; compare
      vs ffn_layer_0.
  attn_half with n_heads=1 — rules the 2-head einsum batching in/out by
      rebuilding the XLA attention with a single 280-wide head... (skipped
      if halves already localize).

Writes docs/fused_drift_sublayer.json.
"""

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
  sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np

from deepconsensus_tpu.models import checkpoint as ckpt_lib
from deepconsensus_tpu.models import configs, model as model_lib
from deepconsensus_tpu.ops import fused_encoder as fe
from tools.embed_kernel_tpu_check import make_args


def cmp(name, a, b, out):
  a, b = np.asarray(a), np.asarray(b)
  out[name] = {
      'bitwise': bool((a == b).all()),
      'maxdiff': float(np.max(np.abs(a - b))),
      'frac': float(np.mean(a != b)),
  }
  print(name, out[name])


def main():
  out = {'device': str(jax.devices()[0])}
  print(out)
  toy = os.path.join(_REPO, 'models_out/toy_model')
  params = configs.read_params_from_json(toy)
  configs.finalize_params(params)
  model = model_lib.get_model(params)
  variables = model_lib.init_params(model, params)
  payload = ckpt_lib.load_checkpoint(
      ckpt_lib.latest_checkpoint(toy), {'variables': jax.device_get(variables)}
  )
  variables = payload['variables']

  rng = np.random.default_rng(9)
  args = make_args(rng, params, 64, params.max_passes)
  xla_outs = jax.jit(
      lambda v, a: model.apply(
          v, **a, embed_matmul=True, deterministic=True,
          method='compact_outputs',
      )
  )(variables, args)
  h = jax.jit(
      lambda v, a: model.apply(v, **a, embed_matmul=True,
                               method='compact_embed')
  )(variables, args)

  lp = fe.extract_layer_params(
      variables['params']['encoder_stack'], params.num_hidden_layers
  )[0]
  win = params.attn_win_size
  zero = jnp.zeros_like(lp['alpha_attn'])

  attn_half = jax.jit(
      lambda h: fe.fused_encoder_layer(
          h, **dict(lp, alpha_ffn=zero), win=win
      )
  )(h)
  cmp('attn_half', xla_outs['self_attention_layer_0'], attn_half, out)

  x_attn = xla_outs['self_attention_layer_0']
  ffn_half = jax.jit(
      lambda x: fe.fused_encoder_layer(
          x, **dict(lp, alpha_attn=zero), win=win
      )
  )(x_attn)
  cmp('ffn_half', xla_outs['ffn_layer_0'], ffn_half, out)

  with open(os.path.join(_REPO, 'docs', 'fused_drift_sublayer.json'), 'w') as f:
    json.dump(out, f, indent=2)
  print(json.dumps(out))


if __name__ == '__main__':
  main()
