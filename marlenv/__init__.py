"""Drop-in import-compatibility shim for the reference's ``marlenv``.

The reference repo nests its package as ``marlenv.marlenv`` (a checkout
of kc-ml2/marlenv inside the project root), so its own scripts import
``from marlenv.marlenv.wrappers import make_snake, RenderGUI``
(test_env.py:1). This shim resolves those exact imports against the
TPU-native implementation, so reference scripts — including the
reference's unmodified ``test_env.py`` — run as-is from this repo root
(proven by tests/test_wrappers.py::test_reference_test_env_runs_unmodified).

Intentionally a re-export layer and nothing else; the real API lives in
``marlsnake_tpu.envs.wrappers``.
"""

from marlsnake_tpu.envs import wrappers  # noqa: F401
