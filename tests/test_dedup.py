"""Distributed connected components (georay.dedup.connected_components
— the near-dup cluster step): exact equality with a union-find oracle
over chains, cliques and random graphs."""

def test_connected_components_hash_to_min(ray_session):
    """Chain (worst-case diameter), cliques, singleton-pair, random
    graph vs a driver-side union-find oracle."""
    import numpy as np
    import pyarrow as pa
    import ray
    from georay.dedup import connected_components
    pairs = pa.table({"id_a": [1, 2, 3, 10, 11, 12, 20, 5],
                      "id_b": [0, 1, 2, 11, 12, 10, 21, 5]})
    out = connected_components(ray.data.from_arrow(pairs)) \
        .to_pandas().sort_values("node")
    assert out.set_index("node")["comp"].to_dict() == {
        0: 0, 1: 0, 2: 0, 3: 0, 5: 5, 10: 10, 11: 10, 12: 10,
        20: 20, 21: 20}
    # 99-edge chain: diameter stress for the O(log d) contraction
    chain = pa.table({"id_a": list(range(100, 199)),
                      "id_b": list(range(101, 200))})
    out2 = connected_components(ray.data.from_arrow(chain)).to_pandas()
    assert set(out2["comp"]) == {100} and len(out2) == 100
    # random graph vs union-find
    rng = np.random.default_rng(3)
    a = rng.integers(0, 400, 300)
    b = rng.integers(0, 400, 300)
    parent = list(range(401))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    want = {}
    for x in set(a.tolist()) | set(b.tolist()):
        want[x] = find(x)
    # canonicalize union-find roots to component minima
    comp_min = {}
    for x, r in want.items():
        comp_min[r] = min(comp_min.get(r, x), x)
    want = {x: comp_min[r] for x, r in want.items()}
    got = connected_components(ray.data.from_arrow(pa.table({
        "id_a": pa.array(a), "id_b": pa.array(b)}))).to_pandas()
    assert got.set_index("node")["comp"].to_dict() == want
