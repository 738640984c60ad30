"""Enrich quality-table rows with the data-dependent metric floor.

For each row of results/quality_table_r2.jsonl, rebuild the exact test
split its run saw (from the run dir's args.json) and add
`mse_floor` / `mse_excess` (see evaluate.sigmoid_floor_mse) - no model
evaluation needed, the floor is a pure property of the data.
"""

import json
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')   # data-only; keep off the TPU

import numpy as np  # noqa: E402

from evaluate import sigmoid_floor_mse  # noqa: E402
from vae_gp_ode_tpu.data.mnist import load_data  # noqa: E402


def main(path='results/quality_table_r2.jsonl'):
    rows = [json.loads(line) for line in open(path) if line.strip()]
    out = []
    for row in rows:
        args_json = os.path.join(row['model_path'], 'args.json')
        ta = json.load(open(args_json))
        _, testset = load_data(types.SimpleNamespace(**ta))
        floor, _ = sigmoid_floor_mse(np.asarray(testset.X))
        row['mse_floor'] = round(floor, 6)
        row['mse_excess'] = round(row['mse_mean'] - floor, 6)
        out.append(row)
        print(f"{row['config']:24s} total {row['mse_mean']:.4f}  "
              f"floor {floor:.4f}  excess {row['mse_excess']:+.4f}")
    with open(path, 'w') as f:
        for row in out:
            f.write(json.dumps(row) + '\n')


if __name__ == '__main__':
    main(*sys.argv[1:])
