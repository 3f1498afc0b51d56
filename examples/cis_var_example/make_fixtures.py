"""Regenerate the committed cis_var_example fixtures (deterministic).

Mirrors the shape of the reference's GTEx Whole Blood example
(/root/reference/phaser_pop/cis_var_example/run.sh:1-8): a gw_phased
genes x samples count matrix, a merged population VCF, a (gene, variant)
test-pairs table, and a vcf_sample -> bed_sample map — at committed-fixture
scale instead of dbGaP-restricted scale.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
from phaser_tpu.io import bgzf, tabix  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
S, G, V = 24, 6, 8


def main():
    rng = np.random.default_rng(42)
    vsamples = ["POP-%04d" % i for i in range(S)]
    bsamples = ["POP-%04d-RNA" % i for i in range(S)]
    with open(os.path.join(HERE, "sample_map.txt"), "w") as f:
        f.write("vcf_sample\tbed_sample\n")
        for v, b in zip(vsamples, bsamples):
            f.write("%s\t%s\n" % (v, b))

    genes = ["ENSG%011d.%d" % (227000 + i, 3 + i % 4) for i in range(G)]
    rows = ["#contig\tstart\tstop\tname\t" + "\t".join(bsamples)]
    for gi, g in enumerate(genes):
        start = 5000 + gi * 3000
        counts = ["%d|%d" % (rng.integers(0, 40), rng.integers(0, 40))
                  for _ in range(S)]
        rows.append("chr1\t%d\t%d\t%s\t%s"
                    % (start, start + 2500, g, "\t".join(counts)))
    bed = os.path.join(HERE, "matrix.gw_phased.bed.gz")
    bgzf.compress_to_path(("\n".join(rows) + "\n").encode(), bed)

    vlines = ["##fileformat=VCFv4.2",
              "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" +
              "\t".join(vsamples)]
    pairs = ["gene_id\tvar_id\tvar_contig\tvar_pos\tvar_ref\tvar_alt"]
    for vi in range(V):
        pos = 6000 + vi * 2200
        ref, alt = "G", "A"
        vid = "chr1_%d_%s_%s_b38" % (pos, ref, alt)
        gts = rng.choice(["0|1", "1|0", "0|0", "1|1", "0/1"], size=S,
                         p=[0.3, 0.3, 0.15, 0.15, 0.1])
        vlines.append("chr1\t%d\t%s\t%s\t%s\t100\tPASS\t.\tGT\t%s"
                      % (pos, vid, ref, alt, "\t".join(gts)))
        pairs.append("%s\t%s\tchr1\t%d\t%s\t%s"
                     % (genes[vi % G], vid, pos, ref, alt))
    vcf = os.path.join(HERE, "merged.vcf.gz")
    bgzf.compress_to_path(("\n".join(vlines) + "\n").encode(), vcf)
    tabix.build_vcf_index(vcf)
    with open(os.path.join(HERE, "test_pairs.txt"), "w") as f:
        f.write("\n".join(pairs) + "\n")
    print("fixtures written to", HERE)


if __name__ == "__main__":
    main()
