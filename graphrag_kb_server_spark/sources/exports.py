"""S5/S9 — export formats: GraphML, GEXF (compatibility boundary only;
the system of record is the parquet/Iceberg node+edge tables).

Reference: graph persisted/reloaded as GraphML
(/root/reference/graphrag_kb_server/service/lightrag/lightrag_graph_support.py:19-27),
communities exported as gexf (:93-106), centrality as xlsx
(lightrag_centrality.py:88-97). Exports are driver-side by design —
they exist for humans/tools, not for scale; guard rails cap row counts.
"""

from __future__ import annotations

from xml.sax.saxutils import escape

from pyspark.sql import DataFrame

MAX_EXPORT_ROWS = 200_000


def _check_size(df: DataFrame, what: str) -> None:
    if df.limit(MAX_EXPORT_ROWS + 1).count() > MAX_EXPORT_ROWS:
        raise ValueError(
            f"{what} export exceeds {MAX_EXPORT_ROWS} rows; exports are a "
            "driver-side compatibility boundary — filter first"
        )


def to_graphml(nodes: DataFrame, edges: DataFrame, path: str) -> None:
    """Write an undirected GraphML mirroring the reference's node/edge
    attribute keys (entity_type/description on nodes; weight/keywords/
    description on edges)."""
    _check_size(nodes, "nodes")
    _check_size(edges, "edges")
    with open(path, "w", encoding="utf-8") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write('<graphml xmlns="http://graphml.graphdrawing.org/xmlns">\n')
        f.write('<key id="d0" for="node" attr.name="entity_type" attr.type="string"/>\n')
        f.write('<key id="d1" for="node" attr.name="description" attr.type="string"/>\n')
        f.write('<key id="d2" for="edge" attr.name="weight" attr.type="double"/>\n')
        f.write('<key id="d3" for="edge" attr.name="keywords" attr.type="string"/>\n')
        f.write('<graph edgedefault="undirected">\n')
        for r in nodes.toLocalIterator():
            f.write(
                f'<node id="{escape(r["name"])}">'
                f'<data key="d0">{escape(r["type"] or "")}</data>'
                f'<data key="d1">{escape((r["description"] or "")[:500])}</data>'
                f"</node>\n"
            )
        for r in edges.toLocalIterator():
            f.write(
                f'<edge source="{escape(r["src"])}" target="{escape(r["tgt"])}">'
                f'<data key="d2">{r["weight"]}</data>'
                f'<data key="d3">{escape(r["keywords"] or "")}</data>'
                f"</edge>\n"
            )
        f.write("</graph>\n</graphml>\n")


def communities_to_gexf(communities: DataFrame, path: str) -> None:
    """Child→parent community network as gexf
    (lightrag_graph_support.py:93-106)."""
    _check_size(communities, "communities")
    rows = communities.select("cluster", "parent_cluster", "size").collect()
    with open(path, "w", encoding="utf-8") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write('<gexf xmlns="http://gexf.net/1.3" version="1.3">\n')
        f.write('<graph defaultedgetype="directed">\n<nodes>\n')
        for r in rows:
            f.write(f'<node id="{escape(r["cluster"])}" label="{escape(r["cluster"])}"/>\n')
        f.write("</nodes>\n<edges>\n")
        for i, r in enumerate(rows):
            if r["parent_cluster"]:
                f.write(
                    f'<edge id="{i}" source="{escape(r["cluster"])}" '
                    f'target="{escape(r["parent_cluster"])}"/>\n'
                )
        f.write("</edges>\n</graph>\n</gexf>\n")
