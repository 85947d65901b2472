"""Copy-constraint permutation: union-find cycles -> sparse matrix P, P@Z=Z.

Replaces reference `src/plonk/permutation.rs` + `src/plonk/util.rs:79-152`
(SURVEY.md §2.3).  Z = [instance columns (num_io lengths) | advice columns
(2^k each)], flattened; fixed columns may not participate.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Sequence

# Column reference inside the permutation argument: ("instance"|"advice", index)
PermColumn = tuple


@dataclass
class Assembly:
    """Cycle-merging structure (halo2-keygen style union-by-size with
    explicit cycle links; reference `permutation.rs:25-115`)."""

    columns: list[PermColumn]
    n: int
    mapping: list[list[tuple[int, int]]]
    aux: list[list[tuple[int, int]]]
    sizes: list[list[int]]

    @staticmethod
    def new(columns: Sequence[PermColumn], n: int) -> "Assembly":
        # sort: Fixed < Advice < Instance in the reference ordering; we only
        # allow advice/instance and sort advice-before-instance, by index.
        cols = sorted(columns, key=lambda c: (0 if c[0] == "advice" else 1, c[1]))
        base = [[(i, j) for j in range(n)] for i in range(len(cols))]
        return Assembly(
            columns=list(cols),
            n=n,
            mapping=[list(col) for col in base],
            aux=[list(col) for col in base],
            sizes=[[1] * n for _ in cols],
        )

    def copy(self, left: PermColumn, left_row: int, right: PermColumn, right_row: int):
        lc = self.columns.index(left)
        rc = self.columns.index(right)
        left_cycle = self.aux[lc][left_row]
        right_cycle = self.aux[rc][right_row]
        if left_cycle == right_cycle:
            return
        if self.sizes[left_cycle[0]][left_cycle[1]] < self.sizes[right_cycle[0]][right_cycle[1]]:
            left_cycle, right_cycle = right_cycle, left_cycle
        self.sizes[left_cycle[0]][left_cycle[1]] += self.sizes[right_cycle[0]][right_cycle[1]]
        i = right_cycle
        while True:
            self.aux[i[0]][i[1]] = left_cycle
            i = self.mapping[i[0]][i[1]]
            if i == right_cycle:
                break
        self.mapping[lc][left_row], self.mapping[rc][right_row] = (
            self.mapping[rc][right_row],
            self.mapping[lc][left_row],
        )


@dataclass
class PermutationData:
    """Frozen copy graph (reference `permutation.rs:117-146`)."""

    columns: list[PermColumn]
    mapping: list[list[tuple[int, int]]]

    @staticmethod
    def from_assembly(a: Assembly) -> "PermutationData":
        return PermutationData(list(a.columns), [list(m) for m in a.mapping])

    def matrix(self, k: int, num_io: Sequence[int], num_advice: int):
        """COO triplets of P (reference `plonk/util.rs:79-152`)."""
        num_rows = 1 << k
        rows_len = list(num_io) + [num_rows] * num_advice

        def flat_col_offset(col: PermColumn) -> int:
            kind, idx = col
            if kind == "instance":
                return idx
            if kind == "advice":
                return len(num_io) + idx
            raise ValueError(f"fixed column in permutation: {col}")

        def flat_index(col: PermColumn, row: int) -> int:
            return sum(rows_len[: flat_col_offset(col)]) + row

        not_in_perm = set(range(len(num_io) + num_advice))
        triplets = []
        for left_idx, mapping_vec in enumerate(self.mapping):
            left_col = self.columns[left_idx]
            not_in_perm.discard(flat_col_offset(left_col))
            inst_rows = num_io[left_col[1]] if left_col[0] == "instance" else None
            for left_row, (cyc_col, cyc_row) in enumerate(mapping_vec):
                if inst_rows is not None and left_row >= inst_rows:
                    continue
                right_col = self.columns[cyc_col]
                not_in_perm.discard(flat_col_offset(right_col))
                triplets.append((flat_index(left_col, left_row), flat_index(right_col, cyc_row), 1))

        for column_offset in not_in_perm:
            col_off = sum(rows_len[:column_offset])
            for row in range(rows_len[column_offset]):
                triplets.append((col_off + row, col_off + row, 1))
        return triplets

    def rm_copy_constraints(self, instance_columns_to_remove: Iterable[int]) -> "PermutationData":
        """Detach given instance columns from all cycles (reference
        `permutation.rs:148-...`): every removed cell becomes a self-cycle and
        is spliced out of its original cycle."""
        remove = set(instance_columns_to_remove)
        mapping = [list(m) for m in self.mapping]

        def is_removed(ci: int) -> bool:
            kind, idx = self.columns[ci]
            return kind == "instance" and idx in remove

        for ci in range(len(self.columns)):
            if is_removed(ci):
                continue
            for ri in range(len(mapping[ci])):
                # walk past removed cells
                nxt = mapping[ci][ri]
                while is_removed(nxt[0]) and nxt != (ci, ri):
                    nxt = self.mapping[nxt[0]][nxt[1]]
                mapping[ci][ri] = nxt
        for ci in range(len(self.columns)):
            if is_removed(ci):
                for ri in range(len(mapping[ci])):
                    mapping[ci][ri] = (ci, ri)
        return PermutationData(list(self.columns), mapping)
