# Developer workflow (role of reference Makefile:1-59, TPU-flavored).

.PHONY: format lint type-check test debug profile bench native clean

format:
	ruff format segma_tpu tests scripts || true

lint:
	ruff check segma_tpu tests scripts

# Gating (reference Makefile:20-21 gates --disallow-untyped-defs):
# check_types.py enforces annotation coverage on every public def and
# always runs; the mypy pass is gating wherever mypy is installed
# (CI installs it — this dev image cannot, zero egress).
type-check:
	python scripts/check_types.py
	@if python -c "import mypy" 2>/dev/null; then \
	  python -m mypy segma_tpu --ignore-missing-imports; \
	else echo "mypy not installed here; CI runs it (gating)"; fi

test:
	python -m pytest tests/ -x -q

debug:
	bash scripts/debug.sh

# jax profiler trace of the inference hot path -> profiles/ (xprof-compatible)
profile:
	python scripts/profile_inference.py --trace-dir profiles

bench:
	python bench.py

native:
	$(MAKE) -C native

# interactive TPU shell (role of the reference's SLURM `it` target):
# queued-up dev VM attach on a provisioned xpk/GKE cluster
it:
	xpk workload create --workload segma-dev --tpu-type v5litepod-8 \
	  --docker-image segma-tpu:latest --command "sleep infinity" && \
	  echo "attach with: kubectl exec -it <pod> -- bash"

clean:
	rm -rf .cache __pycache__ **/__pycache__ profiles
