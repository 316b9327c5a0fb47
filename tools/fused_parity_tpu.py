"""On-chip bitwise-parity localization: fused encoder vs XLA encoder.

With the FFN un-chunked (ops/fused_encoder.py) and the evidence that
Mosaic and XLA dots match bitwise at default precision when contractions
aren't re-associated (docs/fused_exactness.json), this checks whether the
whole fused encoder now reproduces the XLA parity graph bit-for-bit on
real toy weights, layer by layer, and at the logits. Writes
docs/fused_parity_tpu.json.
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


def main():
  out = {'device': str(jax.devices()[0])}
  print(out)
  params = configs.read_params_from_json(os.path.join(_REPO, 'models_out/toy_model'))
  configs.finalize_params(params)
  model = model_lib.get_model(params)
  variables = model_lib.init_params(model, params)
  payload = ckpt_lib.load_checkpoint(
      ckpt_lib.latest_checkpoint(os.path.join(_REPO, 'models_out/toy_model')),
      {'variables': jax.device_get(variables)},
  )
  variables = payload['variables']

  rng = np.random.default_rng(9)
  B = 256
  args = make_args(rng, params, B, params.max_passes)

  xla_outs = jax.jit(
      lambda v, a: model.apply(
          v, **a, embed_matmul=True, deterministic=True,
          method='compact_outputs',
      )
  )(variables, args)

  h = jax.jit(
      lambda v, a: model.apply(
          v, **a, embed_matmul=True, method='compact_embed'
      )
  )(variables, args)

  layer_params = fe.extract_layer_params(
      variables['params']['encoder_stack'], params.num_hidden_layers
  )

  @jax.jit
  def fused_layers(h):
    outs = []
    x = h
    for n in range(params.num_hidden_layers):
      x = fe.fused_encoder_layer(
          x, **layer_params[n], win=params.attn_win_size
      )
      outs.append(x)
    return outs

  fused_per_layer = jax.device_get(fused_layers(h))
  for n in range(params.num_hidden_layers):
    ref = np.asarray(xla_outs[f'ffn_layer_{n}'])
    got = np.asarray(fused_per_layer[n])
    eq = bool((ref == got).all())
    out[f'layer_{n}_bitwise'] = eq
    out[f'layer_{n}_maxdiff'] = float(np.max(np.abs(ref - got)))
    out[f'layer_{n}_frac'] = float(np.mean(ref != got))
    print(f'layer {n}: bitwise={eq} maxdiff={out[f"layer_{n}_maxdiff"]:.3e} '
          f'frac={out[f"layer_{n}_frac"]:.4f}')
    if not eq and n == 0:
      break

  logits_fused = jax.jit(
      lambda v, h: fe.fused_logits(
          v['params'], h, params.num_hidden_layers, params.attn_win_size
      )
  )(variables, h)
  lf = np.asarray(jax.device_get(logits_fused))
  lx = np.asarray(xla_outs['logits'])
  out['logits_bitwise'] = bool((lx == lf).all())
  out['logits_maxdiff'] = float(np.max(np.abs(lx - lf)))
  print('logits bitwise:', out['logits_bitwise'], 'maxdiff', out['logits_maxdiff'])

  with open(os.path.join(_REPO, 'docs', 'fused_parity_tpu.json'), 'w') as f:
    json.dump(out, f, indent=2)
  print(json.dumps(out))


if __name__ == '__main__':
  main()
