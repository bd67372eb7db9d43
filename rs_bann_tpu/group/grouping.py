"""Marker groupings: assignment of SNP indices to branches.

Rebuild of /root/reference/src/group/: the ``MarkerGrouping`` trait becomes a
small base class; concrete groupings are gene-window (GFF), LD-centered,
external-file, and uniform.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional


class MarkerGrouping:
    """group ix -> list of marker indices (group/grouping.rs:7-32)."""

    def __init__(self, groups: Dict[int, List[int]]):
        self.groups = groups

    @property
    def num_groups(self) -> int:
        return len(self.groups)

    def group(self, ix: int) -> Optional[List[int]]:
        return self.groups.get(ix)

    def group_sizes(self) -> List[int]:
        sizes = [0] * self.num_groups
        for k, v in self.groups.items():
            sizes[k] = len(v)
        return sizes

    def to_file(self, stem):
        """Two-column `marker_ix\tgroup_ix` .groups file
        (group/grouping.rs:17-32)."""
        path = Path(stem).with_suffix(".groups")
        with open(path, "w") as f:
            for gix in range(self.num_groups):
                for mix in self.groups[gix]:
                    f.write(f"{mix}\t{gix}\n")


class UniformGrouping(MarkerGrouping):
    """k groups x m consecutive markers (group/uniform.rs:11-22)."""

    def __init__(self, num_groups: int, num_markers_per_group: int):
        super().__init__(
            {
                g: list(
                    range(g * num_markers_per_group, (g + 1) * num_markers_per_group)
                )
                for g in range(num_groups)
            }
        )


class ExternalGrouping(MarkerGrouping):
    """Two-column grouping file; group ids must be contiguous 0-based
    (group/external.rs:15-58)."""

    @staticmethod
    def from_file(path) -> "ExternalGrouping":
        groups: Dict[int, List[int]] = {}
        with open(path) as f:
            for line in f:
                if not line.strip():
                    continue
                fields = line.split()
                mix, gix = int(fields[0]), int(fields[1])
                groups.setdefault(gix, []).append(mix)
        assert not any(k >= len(groups) for k in groups), (
            "ExternalGrouping must have continuous, 0-based group indices."
        )
        g = ExternalGrouping.__new__(ExternalGrouping)
        MarkerGrouping.__init__(g, groups)
        return g


class GeneGrouping(MarkerGrouping):
    """SNPs within gene +/- margin windows, streamed in sorted order
    (group/gene.rs:42-148)."""

    def __init__(self, groups, meta, min_group_size):
        super().__init__(groups)
        self.meta = meta
        self.min_group_size = min_group_size

    @staticmethod
    def from_gff(gff_file, bim_file, margin: int, min_group_size: int = 1):
        from ..io.plink_text import chromosome_order, read_bim, read_gff

        def relpos(snp, feat):
            """-1: gff ahead of snp, +1: snp ahead of window, 0: overlap
            (gene.rs:126-148)."""
            sc = chromosome_order(snp.chromosome)
            fc = chromosome_order(feat.chromosome)
            if sc > fc:
                return 1
            if fc > sc:
                return -1
            start = max(feat.start - margin, 0)
            end = feat.end + margin
            if start > snp.position:
                return -1
            if snp.position > end:
                return 1
            return 0

        bim_iter = read_bim(bim_file)
        buffer: List = []
        groups: Dict[int, List[int]] = {}
        meta: Dict[int, dict] = {}
        group_id = 0
        bim_done = False

        for feat in read_gff(gff_file):
            if feat.feature != "gene":
                continue
            # drop buffered SNPs before the window
            while buffer and relpos(buffer[0], feat) == -1:
                buffer.pop(0)
            for snp in buffer:
                if relpos(snp, feat) == 0:
                    groups.setdefault(group_id, []).append(snp.ix)
            while not bim_done:
                snp = next(bim_iter, None)
                if snp is None:
                    bim_done = True
                    break
                r = relpos(snp, feat)
                if r == 1:
                    buffer.append(snp)
                    break
                if r == 0:
                    groups.setdefault(group_id, []).append(snp.ix)
                    buffer.append(snp)
            if group_id in groups:
                if len(groups[group_id]) < min_group_size:
                    del groups[group_id]
                else:
                    meta[group_id] = dataclass_to_dict(feat)
                    group_id += 1
        return GeneGrouping(groups, meta, min_group_size)

    def meta_to_file(self, path):
        with open(path, "w") as f:
            json.dump({str(k): v for k, v in self.meta.items()}, f, indent=2)


def dataclass_to_dict(d):
    import dataclasses

    return dataclasses.asdict(d)


class CenteredGrouping(MarkerGrouping):
    """LD-centered grouping (group/centered.rs:91-133)."""


class CorrGraph:
    """SNP correlation graph from a plink .ld file
    (group/centered.rs:49-133)."""

    def __init__(self, g: Dict[int, set]):
        self.g = g

    @staticmethod
    def from_plink_ld(ld_file, bim_file) -> "CorrGraph":
        id2ix = {}
        with open(bim_file) as f:
            for ix, line in enumerate(l for l in f if l.strip()):
                id2ix[line.split()[1]] = ix
        g: Dict[int, set] = {}
        with open(ld_file) as f:
            for lix, line in enumerate(f):
                if lix == 0 or not line.strip():
                    continue
                fields = line.split()
                a, b = id2ix[fields[2]], id2ix[fields[5]]
                g.setdefault(a, set()).add(b)
                g.setdefault(b, set()).add(a)
        for ix in id2ix.values():
            g.setdefault(ix, set())
        return CorrGraph(g)

    def centered_grouping(self, min_group_size: int = 1) -> CenteredGrouping:
        """Greedy: highest-degree nodes become centers; group = center +
        neighbors; leftovers appended to the nearest (by index) group
        (centered.rs:91-133)."""
        groups: Dict[int, List[int]] = {}
        nodes = sorted(self.g.items(), key=lambda kv: (-len(kv[1]), kv[0]))
        taken = set()
        gix = 0
        for cix, neigh in nodes:
            if cix in taken:
                continue
            if neigh and len(neigh) > min_group_size:
                group = sorted(neigh) + [cix]
                taken.update(group)
                groups[gix] = group
                gix += 1
            else:
                for d in range(1, 100):
                    if cix - d in groups:
                        groups[cix - d].append(cix)
                        break
                    if cix + d in groups:
                        groups[cix + d].append(cix)
                        break
        return CenteredGrouping(groups)
