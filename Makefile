.PHONY: all native test bench parity clean

# Turnkey LM-O AR parity vs the reference's reproduced 33.7 (BASELINE.md).
# Requires the BOP LM-O dataset and official DINOv2 ViT-S/14-reg weights:
#   make parity BOP_ROOT=/data/bop WEIGHTS=/data/dinov2_vits14_reg4_pretrain.pth \
#       [DETECTIONS=/data/cnos-fastsam_lmo.json] [PARITY_OUT=/tmp/foundpose_parity]
PARITY_OUT ?= /tmp/foundpose_parity
parity:
	python benchmarks/parity_lmo.py --bop-root "$(BOP_ROOT)" \
		--weights "$(WEIGHTS)" --output-dir "$(PARITY_OUT)" \
		$(if $(DETECTIONS),--detections "$(DETECTIONS)")

all: native

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -q

bench: native
	python bench.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
