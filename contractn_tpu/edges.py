"""Edge objects of a tensor network.

An edge either bonds two core nodes or terminates at a synthetic "dangler"
node (an open mode of the network).  Each edge stores its dimension (``-1``
meaning not-yet-determined) and a single-character einsum symbol.

API parity target: ``/root/reference/contractn/edges.py``.  Unlike the
reference, attributes live directly on the object instead of a networkx
edge-attribute dict, so accesses are plain attribute loads.
"""

from .symbols import check_symbol


class Edge:
    """Single edge of a TN, identified by ``(node1, node2, key)``.

    ``key`` disambiguates parallel edges between the same node pair
    (multigraph semantics, needed e.g. for two bonds between the same cores).
    """

    __slots__ = ("tn", "name", "_dim", "_symbol")

    def __init__(self, parent_tn, edge_id, dim, symbol):
        if not (isinstance(edge_id, tuple) and len(edge_id) == 3):
            raise TypeError(f"Edge ids are (node1, node2, key) tuples, got {edge_id!r}")
        if not isinstance(dim, int):
            raise TypeError(f"Edge dimension must be an int, got {dim!r}")
        check_symbol(symbol)
        self.tn = parent_tn
        self.name = edge_id
        self._dim = dim
        self._symbol = symbol

    @property
    def nodes(self):
        """The two Node objects this edge connects (order as in the id)."""
        return tuple(self.tn._nodes[n] for n in self.name[:2])

    @property
    def symbol(self):
        return self._symbol

    @property
    def dim(self):
        return self._dim

    @property
    def var_dim(self):
        """Whether the edge dimension is still undetermined."""
        return self._dim < 0

    @property
    def dangler(self):
        """Whether this edge terminates at a dangling (open-mode) node."""
        return any(n.dangler for n in self.nodes)

    def __repr__(self):
        kind = "dangling" if self.dangler else "bond"
        return (
            f"Edge({self.name[0]!r}--{self.name[1]!r}, key={self.name[2]}, "
            f"symbol={self._symbol!r}, dim={self._dim}, {kind})"
        )
