"""Model summaries: parameter counts per module.

Counterpart of the reference's VAE.print_summary (vae.py:25-30, via the
external torchsummary package): tabulates leaf shapes and parameter counts
for any params pytree (flax params, SVGPParams, or both).
"""

import jax
import numpy as np


def param_count(tree):
    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(tree))


def summarize(tree, name='model'):
    """Return a printable table of '<path>  <shape>  <count>' lines."""
    lines = [f'--- {name} ---']
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    total = 0
    for path, leaf in flat:
        pathstr = '/'.join(str(getattr(p, 'key', getattr(p, 'name', p)))
                           for p in path)
        n = int(np.prod(leaf.shape)) if hasattr(leaf, 'shape') else 1
        total += n
        shape = tuple(leaf.shape) if hasattr(leaf, 'shape') else ()
        lines.append(f'{pathstr:60s} {str(shape):18s} {n:>10,d}')
    lines.append(f'{"TOTAL":60s} {"":18s} {total:>10,d}')
    return '\n'.join(lines)


def print_summary(variables, gp=None, log=print):
    """Print VAE (+ optional GP) parameter summaries."""
    log(summarize(variables.get('params', variables), 'vae params'))
    if gp is not None:
        log(summarize(gp, 'gp params'))
