"""One authoritative default set per mode (SURVEY §5).

The config dataclasses and the engine signatures must agree exactly —
introspection pins them so a default changed in one place fails CI until
both agree. Also pins the documented API-vs-engine grad_edges disagreement
(reference torchregister.py:12 vs warpings.py:30,117) as two explicit layers
rather than an accident.
"""
import dataclasses
import inspect

import numpy as np
import jax.numpy as jnp
import pytest

import torchregister_tpu as tr
from torchregister_tpu.config import (
    API_GRAD_EDGES,
    AffineConfig,
    CascadeConfig,
    FlowConfig,
    RigidConfig,
)
from torchregister_tpu.engines.affine import affine_register
from torchregister_tpu.engines.cascade import register_cascade
from torchregister_tpu.engines.flow import flow_register
from torchregister_tpu.engines.rigid import rigid_register


def _sig_defaults(fn, skip=("moving", "target", "key", "init_params", "init_theta")):
    out = {}
    for name, p in inspect.signature(fn).parameters.items():
        if name in skip or p.default is inspect.Parameter.empty:
            continue
        out[name] = p.default
    return out


@pytest.mark.parametrize(
    "cfg_cls,engine",
    [
        (RigidConfig, rigid_register),
        (AffineConfig, affine_register),
        (FlowConfig, flow_register),
        (CascadeConfig, register_cascade),
    ],
)
def test_config_defaults_match_engine_signature(cfg_cls, engine):
    cfg_defaults = {f.name: f.default for f in dataclasses.fields(cfg_cls)}
    sig_defaults = _sig_defaults(engine)
    assert set(cfg_defaults) == set(sig_defaults), (
        f"{cfg_cls.__name__} fields vs {engine.__name__} kwargs:\n"
        f"only in config: {set(cfg_defaults) - set(sig_defaults)}\n"
        f"only in engine: {set(sig_defaults) - set(cfg_defaults)}"
    )
    for k, v in cfg_defaults.items():
        assert sig_defaults[k] == v, f"{cfg_cls.__name__}.{k}: {v} != engine {sig_defaults[k]}"


def test_api_layer_grad_edges_override_pinned():
    # reference torchregister.py:12 (False) vs warpings.py:30,117 (True):
    # both layers are explicit and must stay that way.
    assert API_GRAD_EDGES is False
    assert RigidConfig().grad_edges is True
    assert AffineConfig().grad_edges is True
    assert inspect.signature(tr.Register.__init__).parameters["grad_edges"].default is API_GRAD_EDGES


def _blob(shape, seed=0):
    rng = np.random.default_rng(seed)
    grids = np.meshgrid(*[np.linspace(-1, 1, s) for s in shape], indexing="ij")
    vol = np.zeros(shape, np.float32)
    for _ in range(4):
        c = rng.uniform(-0.4, 0.4, len(shape))
        w = rng.uniform(0.15, 0.3)
        vol += np.exp(-sum((g - ci) ** 2 for g, ci in zip(grids, c)) / (2 * w**2))
    return jnp.asarray(vol)[None, None]


def test_config_run_equals_direct_engine_call():
    m = _blob((16, 16), 1)
    t = _blob((16, 16), 2)
    cfg = RigidConfig(lr=1e-3, epochs=5, criterions=("mse",), grad_edges=False,
                      optimizer="adam", init="identity")
    w1, r1 = cfg.run(m, t)
    w2, r2 = rigid_register(m, t, lr=1e-3, epochs=5, criterions=("mse",),
                            grad_edges=False, optimizer="adam", init="identity")
    np.testing.assert_allclose(np.asarray(r1.best_theta), np.asarray(r2.best_theta))
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2))
    # overrides win over config fields
    _, r3 = cfg.run(m, t, epochs=3)
    assert np.asarray(r3.losses).shape == (3,)
