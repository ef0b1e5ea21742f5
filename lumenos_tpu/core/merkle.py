"""SHA-256 binary Merkle tree over arbitrary byte leaves.

Mirrors the reference's core/tree.go semantics exactly:
- leaf hash   = SHA256(leaf bytes)
- parent hash = SHA256(left || right)
- odd node count at a level duplicates the last node (tree.go:127-131)
- path = bottom-up sibling hashes; verification orders (current, sibling)
  by index parity and halves the index per level (tree.go:225-268)

Host-side (hashlib is C-speed); a flat-array layout replaces the reference's
node graph so the whole tree is two numpy-friendly passes.
"""

from __future__ import annotations

import hashlib
from typing import Sequence


def _sha256(data: bytes) -> bytes:
    return hashlib.sha256(data).digest()


class MerkleTree:
    def __init__(self, leaves: Sequence[bytes]):
        if len(leaves) == 0:
            raise ValueError("no leaves")
        self.n_leaves = len(leaves)
        # levels[0] = leaf hashes, levels[-1] = [root]
        levels: list[list[bytes]] = [[_sha256(l) for l in leaves]]
        while len(levels[-1]) > 1:
            cur = levels[-1]
            nxt = []
            for i in range(0, len(cur), 2):
                left = cur[i]
                right = cur[i + 1] if i + 1 < len(cur) else cur[i]
                nxt.append(_sha256(left + right))
            levels.append(nxt)
        self.levels = levels

    @property
    def root(self) -> bytes:
        return self.levels[-1][0]

    def get_path(self, index: int) -> list[bytes]:
        if not 0 <= index < self.n_leaves:
            raise IndexError(index)
        path = []
        for level in self.levels[:-1]:
            sibling = index ^ 1
            if sibling >= len(level):
                sibling = index  # duplicated last node
            path.append(level[sibling])
            index //= 2
        return path


def verify_merkle_path(leaf: bytes, path: Sequence[bytes], root: bytes, index: int,
                       leaf_hasher=None) -> bool:
    current = (leaf_hasher or _sha256)(leaf)
    for sibling in path:
        if index % 2 == 0:
            current = _sha256(current + sibling)
        else:
            current = _sha256(sibling + current)
        index //= 2
    return current == root
