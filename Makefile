# Top-level developer entry points. The native IO library builds via
# native/Makefile (invoked here for convenience).

.PHONY: gate test-smoke test-full native bench

gate:            ## entry + multichip dryrun + bench --quick + smoke tests
	bash tools/gate.sh

test-smoke:      ## fast tier (<2 min CPU target): unit/numeric tests
	python -m pytest tests/ -x -q -m "not slow"

test-full:       ## everything, including slow pipeline/system tests
	python -m pytest tests/ -q

native:
	$(MAKE) -C native

bench:
	python bench.py
