#!/usr/bin/env bash
# cis_var worked example — the phaser_tpu analogue of the reference's GTEx
# Whole Blood example (/root/reference/phaser_pop/cis_var_example/run.sh):
# compute cis-regulatory effect sizes (aFC) for (gene, variant) pairs from
# a gw_phased expression matrix + a merged population VCF.
#
# The reference's inputs are dbGaP-restricted GTEx downloads; this example
# ships small committed fixtures of the same shape (regenerate them with
# python3 make_fixtures.py). Gene ids carry version suffixes and the pairs
# table does not, hence --ignore_v 1, exactly like the reference command.
set -euo pipefail
cd "$(dirname "$0")"
PYTHONPATH="$(cd ../.. && pwd)" python3 -m phaser_tpu.cli.cis_var_main \
  --bed matrix.gw_phased.bed.gz \
  --vcf merged.vcf.gz \
  --pairs test_pairs.txt \
  --map sample_map.txt \
  --o results.txt \
  --ignore_v 1 \
  --bs 1000 --bs_seed 1
head -3 results.txt | cut -c1-120
