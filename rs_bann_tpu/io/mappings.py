"""Chromosome <-> RefSeq / GenBank accession maps for GRCh37 (hg19).

Rebuild of the reference's py-prep/mappings.py helper; accession data from
NCBI assembly GCF_000001405.13. Used to translate annotation files whose
seqid column uses accessions instead of plain chromosome names.
"""

# chromosome -> (GenBank CM accession, RefSeq NC accession)
_GRCH37 = {
    "1": ("CM000663.1", "NC_000001.10"),
    "2": ("CM000664.1", "NC_000002.11"),
    "3": ("CM000665.1", "NC_000003.11"),
    "4": ("CM000666.1", "NC_000004.11"),
    "5": ("CM000667.1", "NC_000005.9"),
    "6": ("CM000668.1", "NC_000006.11"),
    "7": ("CM000669.1", "NC_000007.13"),
    "8": ("CM000670.1", "NC_000008.10"),
    "9": ("CM000671.1", "NC_000009.11"),
    "10": ("CM000672.1", "NC_000010.10"),
    "11": ("CM000673.1", "NC_000011.9"),
    "12": ("CM000674.1", "NC_000012.11"),
    "13": ("CM000675.1", "NC_000013.10"),
    "14": ("CM000676.1", "NC_000014.8"),
    "15": ("CM000677.1", "NC_000015.9"),
    "16": ("CM000678.1", "NC_000016.9"),
    "17": ("CM000679.1", "NC_000017.10"),
    "18": ("CM000680.1", "NC_000018.9"),
    "19": ("CM000681.1", "NC_000019.9"),
    "20": ("CM000682.1", "NC_000020.10"),
    "21": ("CM000683.1", "NC_000021.8"),
    "22": ("CM000684.1", "NC_000022.10"),
    "X": ("CM000685.1", "NC_000023.10"),
    "Y": ("CM000686.1", "NC_000024.9"),
}

chr2genbank = {c: gb for c, (gb, _) in _GRCH37.items()}
chr2refseq = {c: rs for c, (_, rs) in _GRCH37.items()}
genbank2chr = {gb: c for c, (gb, _) in _GRCH37.items()}
refseq2chr = {rs: c for c, (_, rs) in _GRCH37.items()}


def normalize_chromosome(seqid: str) -> str:
    """Map a seqid (plain name, chrN, or accession) to the plain name."""
    s = seqid.strip()
    if s.startswith("chr"):
        s = s[3:]
    if s in chr2refseq:
        return s
    if s in refseq2chr:
        return refseq2chr[s]
    if s in genbank2chr:
        return genbank2chr[s]
    raise ValueError(f"unknown chromosome/seqid: {seqid}")
