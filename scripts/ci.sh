#!/usr/bin/env bash
# CI entry point (parity with the reference's GitHub workflow: import smoke
# test + fast tests; runs on CPU with 8 virtual devices via tests/conftest).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== native audio library"
make -C qwen3_asr_tpu/audio/csrc

echo "== lint"
if command -v ruff >/dev/null 2>&1; then
  ruff check qwen3_asr_tpu tests tools bench.py __graft_entry__.py
else
  # No linter ships in this image (installs forbidden): tools/lint.py is a
  # first-party AST subset of ruff's F401/F811/E999/W191/W291/E501.
  python tools/lint.py
fi

echo "== import smoke test"
JAX_PLATFORMS=cpu python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import qwen3_asr_tpu
assert len(qwen3_asr_tpu.__all__) > 20
print("import ok:", qwen3_asr_tpu.__version__)
EOF

echo "== tests (fast tier)"
python -m pytest tests/ -q -m "not slow"

echo "== multichip dryrun"
JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8" \
python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as ge
ge.dryrun_multichip(8)
EOF

echo "CI OK"
