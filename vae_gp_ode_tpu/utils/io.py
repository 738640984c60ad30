"""Run-dir, logging and arg-dump helpers.

Rebuild of the reference io utilities (reference:
experiments/model/misc/io_utils.py:6-29). Unlike the reference, save_args
is actually wired into the entry points so every run records its config.
"""

import json
import logging
import os


def makedirs(path):
    os.makedirs(path, exist_ok=True)
    return path


def get_logger(logpath=None, name='vae_gp_ode_tpu', displaying=True,
               saving=True, debug=False):
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG if debug else logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter('%(asctime)s %(message)s')
    if saving and logpath is not None:
        fh = logging.FileHandler(logpath)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    if displaying:
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    logger.propagate = False
    return logger


def save_args(args, path):
    """Dump the run configuration as JSON (reference io_utils.py:13-16,
    which defines but never calls this)."""
    d = {k: v for k, v in sorted(vars(args).items())
         if isinstance(v, (int, float, str, bool, type(None), list))}
    with open(path, 'w') as f:
        json.dump(d, f, indent=2)
