"""A/B the --epochs_per_fetch lever on the REAL trainer (main.py).

bench.py's chained-dispatch protocol measures the idealised win (same
compiled epoch, loss fetch every 10 epochs); this harness measures what
the lever buys end-to-end in main.py, where each epoch also dispatches
the per-epoch monitoring eval (reference main.py:236-246) and the flush
carries five metric arrays + the eval scalar.

Protocol: two full main.py runs (reference envelope, --Nepoch N), K=1 vs
K=10, same seed. Wall-clock is taken from the run's own log timestamps
between the FIRST 'Epoch:' line (so compile + the epoch-0 artifact write,
identical in both runs, cancel) and 'Optimization completed'. Prints one
JSON line.

Usage: python tools/epf_ab_r3.py [--nepoch 600] [--device tpu]
"""

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
from datetime import datetime

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STAMP = re.compile(r'^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3})')


def run_one(nepoch, k, device, tmp, extra=(), flag='--epochs_per_fetch'):
    save = os.path.join(tmp, f'epf{k}')
    args = [sys.executable, 'main.py', '--Nepoch', str(nepoch),
            flag, str(k), '--plot_freq', str(10 * nepoch),
            '--log_freq', str(10 ** 9), '--seed', '11', '--save', save]
    args += list(extra)
    if device == 'cpu':
        args += ['--device', 'cpu']
    r = subprocess.run(args, cwd=REPO, capture_output=True, text=True,
                       timeout=7200)
    if r.returncode != 0:
        raise RuntimeError(f'K={k} run failed:\n{r.stderr[-2000:]}')
    run_dir = [d for d in os.listdir(tmp) if d.startswith(f'epf{k}')][0]
    log = open(os.path.join(tmp, run_dir, 'logs')).read()

    def ts_of(pattern):
        for line in log.splitlines():
            if pattern in line:
                m = STAMP.match(line)
                if m:
                    return datetime.strptime(m.group(1),
                                             '%Y-%m-%d %H:%M:%S,%f')
        raise RuntimeError(f'K={k}: no log line matching {pattern!r}')

    dt = (ts_of('Optimization completed') - ts_of('Epoch:')).total_seconds()
    last_elbo = re.findall(r'tr_elbo:\s*(-?[\d.]+)', log)[-1]
    return dt, float(last_elbo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--nepoch', type=int, default=600)
    ap.add_argument('--device', type=str, default='tpu')
    ap.add_argument('--k', type=int, default=10,
                    help='the chained variant fetch/dispatch period')
    ap.add_argument('--mode', type=str, default='fetch',
                    choices=['fetch', 'dispatch'],
                    help="which lever the chained variant uses: 'fetch' "
                         '= --epochs_per_fetch K (per-epoch dispatch, '
                         "fetch every K); 'dispatch' = "
                         '--epochs_per_dispatch K (K epochs incl. eval '
                         'in ONE dispatch)')
    ap.add_argument('--tiny', action='store_true',
                    help='small model/data (CPU dry-run of the harness)')
    a = ap.parse_args()
    extra = (['--batch', '8', '--Ndata', '16', '--Ntest', '8',
              '--num_inducing', '16', '--num_features', '32', '--T', '8']
             if a.tiny else [])
    with tempfile.TemporaryDirectory() as tmp:
        # K=1 first, K=10 second: if tunnel drift favours either slot it
        # is the later one (caches warm), which under-states, not
        # over-states, the chained win
        flag = ('--epochs_per_fetch' if a.mode == 'fetch'
                else '--epochs_per_dispatch')
        t1, e1 = run_one(a.nepoch, 1, a.device, tmp, extra)
        t10, e10 = run_one(a.nepoch, a.k, a.device, tmp, extra,
                           flag=flag)
    epochs_timed = a.nepoch - 1   # first Epoch line excluded
    print(json.dumps({
        'metric': f'main_py_epochs_per_{a.mode}_ab',
        'nepoch': a.nepoch, 'k': a.k,
        'wall_s_k1': round(t1, 1), 'wall_s_chained': round(t10, 1),
        'ms_per_epoch_k1': round(1e3 * t1 / epochs_timed, 1),
        'ms_per_epoch_chained': round(1e3 * t10 / epochs_timed, 1),
        'speedup_chained_over_k1': round(t1 / t10, 3),
        'final_elbo_identical': e1 == e10,
        'final_elbo_rel_diff': (abs(e1 - e10) / max(abs(e1), 1e-9)),
        # dispatch mode compiles two extra segment variants (L=1, L=5)
        # INSIDE the timed window; the speedup is a lower bound there
        'chained_compiles_in_window': a.mode == 'dispatch',
    }))


if __name__ == '__main__':
    main()
