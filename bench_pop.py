"""phASER-POP scale benchmark: samples/s (expr_matrix) and pairs/s (cis_var).

BASELINE.json config 5 is "phaser_pop at GTEx scale: expression matrix +
cis_var across hundreds of samples". This synthesizes that shape directly —
S gene-AE sample files x G genes for the matrix stage, and an S-sample
genotype VCF + matrix for P (gene, variant) pairs of aFC inference with the
full 10,000-draw bootstrap — and measures throughput of each stage.

Prints ONE JSON line:
  {"metric": "pop_samples_per_s", "value": N, "unit": "samples/s",
   "cis_var_pairs_per_s": N, ...}

Sizes via env: POP_SAMPLES (300), POP_GENES (2000), POP_PAIRS (60),
POP_BS (10000).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

S = int(os.environ.get("POP_SAMPLES", 300))
G = int(os.environ.get("POP_GENES", 2000))
P = int(os.environ.get("POP_PAIRS", 60))
BS = int(os.environ.get("POP_BS", 10000))


def make_gene_ae_dir(tmp, rng):
    d = os.path.join(tmp, "gene_ae")
    os.makedirs(d, exist_ok=True)
    header = "\t".join(["contig", "start", "stop", "name", "aCount",
                        "bCount", "totalCount", "log2_aFC", "n_variants",
                        "variants", "gw_phased", "bam"])
    genes = ["ENSG%06d.1" % i for i in range(G)]
    starts = 1000 + 2000 * np.arange(G)
    features = os.path.join(tmp, "features.bed")
    with open(features, "w") as f:
        for g, st in zip(genes, starts):
            f.write("chr20\t%d\t%d\t%s\n" % (st, st + 1500, g))
    for si in range(S):
        a = rng.integers(0, 40, G)
        b = rng.integers(0, 40, G)
        gw = rng.integers(0, 2, G)
        rows = [header]
        for gi in range(G):
            rows.append("chr20\t%d\t%d\t%s\t%d\t%d\t%d\t0.0\t2\tv1,v2\t%d\tS%03d"
                        % (starts[gi], starts[gi] + 1500, genes[gi], a[gi],
                           b[gi], a[gi] + b[gi], gw[gi], si))
        with open(os.path.join(d, "sample%03d.txt" % si), "w") as f:
            f.write("\n".join(rows) + "\n")
    return d, features, genes, starts


def make_cis_var_inputs(tmp, rng, matrix_path):
    from phaser_tpu.io import bgzf, tabix
    vs = ["S%03d" % i for i in range(S)]
    map_path = os.path.join(tmp, "sample_map.txt")
    with open(map_path, "w") as f:
        f.write("vcf_sample\tbed_sample\n")
        for v in vs:
            f.write("%s\t%s\n" % (v, v))
    # cycle genes when P > G so every pair resolves to a matrix row (no
    # silently-dropped pairs inflating the rate)
    genes = ["ENSG%06d.1" % (i % G) for i in range(P)]
    vcf_rows = ["##fileformat=VCFv4.2",
                "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" +
                "\t".join(vs)]
    pair_rows = ["gene_id\tvar_id\tvar_contig\tvar_pos\tvar_ref\tvar_alt"]
    for vi in range(P):
        pos = 1200 + vi * 2000
        gts = ["%d|%d" % (rng.integers(0, 2), rng.integers(0, 2))
               for _ in range(S)]
        vcf_rows.append("chr20\t%d\tvar%d\tA\tG\t100\tPASS\t.\tGT\t%s"
                        % (pos, vi, "\t".join(gts)))
        pair_rows.append("%s\tvar%d\tchr20\t%d\tA\tG" % (genes[vi], vi, pos))
    vcf_path = os.path.join(tmp, "pop.vcf.gz")
    bgzf.compress_to_path(("\n".join(vcf_rows) + "\n").encode(), vcf_path)
    tabix.build_vcf_index(vcf_path)
    pairs_path = os.path.join(tmp, "pairs.txt")
    with open(pairs_path, "w") as f:
        f.write("\n".join(pair_rows) + "\n")
    return vcf_path, pairs_path, map_path


def main():
    import tempfile
    from phaser_tpu.analysis.cis_var import run_cis_var
    from phaser_tpu.analysis.expr_matrix import run_expr_matrix

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as tmp:
        d, features, genes, starts = make_gene_ae_dir(tmp, rng)
        mat = os.path.join(tmp, "matrix")
        t0 = time.perf_counter()
        run_expr_matrix(d, features, mat, log=lambda *a: None)
        t_matrix = time.perf_counter() - t0

        vcf_path, pairs_path, map_path = make_cis_var_inputs(
            tmp, rng, mat + ".gw_phased.bed.gz")
        # headline: engine="auto" — what users get (measured-crossover gate
        # between the numpy path and the batched device bootstrap)
        out = os.path.join(tmp, "cis_var.txt")
        t0 = time.perf_counter()
        run_cis_var(mat + ".gw_phased.bed.gz", vcf_path, pairs_path,
                    map_path, out, bs=BS, bs_seed=7, engine="auto")
        t_cis = time.perf_counter() - t0
        n_out = sum(1 for _ in open(out)) - 1

        out_jax = os.path.join(tmp, "cis_var_jax.txt")
        t0 = time.perf_counter()
        run_cis_var(mat + ".gw_phased.bed.gz", vcf_path, pairs_path,
                    map_path, out_jax, bs=BS, bs_seed=7, engine="jax")
        t_jax = time.perf_counter() - t0

        # numpy-engine comparison floor, on a subset when P is large (the
        # per-pair numpy bootstrap rate is flat, so the subset rate is the
        # full-run rate)
        np_pairs = min(P, int(os.environ.get("POP_NUMPY_PAIRS", "30")))
        with open(pairs_path) as f:
            pl = f.read().splitlines()
        sub_pairs = os.path.join(tmp, "pairs_sub.txt")
        with open(sub_pairs, "w") as f:
            f.write("\n".join(pl[:np_pairs + 1]) + "\n")
        out_np = os.path.join(tmp, "cis_var_np.txt")
        t0 = time.perf_counter()
        run_cis_var(mat + ".gw_phased.bed.gz", vcf_path, sub_pairs,
                    map_path, out_np, bs=BS, bs_seed=7, engine="numpy")
        t_np = time.perf_counter() - t0

    payload = {
        "metric": "pop_samples_per_s",
        "value": round(S / t_matrix, 2),
        "unit": "samples/s",
        "samples": S, "genes": G,
        "matrix_s": round(t_matrix, 3),
        "cis_var_pairs_per_s": round(n_out / t_cis, 2),
        "cis_var_engine": "auto",
        "cis_var_jax_pairs_per_s": round(n_out / t_jax, 2),
        "cis_var_numpy_pairs_per_s": round(np_pairs / t_np, 2),
        "cis_var_numpy_pairs": np_pairs,
        "cis_var_pairs": n_out,
        "cis_var_bs": BS,
        "cis_var_s": round(t_cis, 3),
        "cis_var_jax_s": round(t_jax, 3),
        "cis_var_numpy_s": round(t_np, 3),
    }
    print(json.dumps(payload))
    out_json = os.environ.get("POP_BENCH_OUT", "")
    if out_json:
        with open(out_json, "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
