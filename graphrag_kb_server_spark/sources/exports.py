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
from pyspark.sql import functions as F

MAX_EXPORT_ROWS = 200_000


def _check_size(df: DataFrame, what: str) -> None:
    if df.limit(MAX_EXPORT_ROWS + 1).count() > MAX_EXPORT_ROWS:
        raise ValueError(
            f"{what} export exceeds {MAX_EXPORT_ROWS} rows; exports are a "
            "driver-side compatibility boundary — filter first"
        )


def _attr(v: str) -> str:
    """Escape for an XML ATTRIBUTE position: saxutils.escape alone
    leaves double quotes intact, so a name like 'John "Jack" Smith'
    would terminate the attribute early — malformed XML no parser
    accepts."""
    return escape(v, {'"': "&quot;"})


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
        f.write('<key id="d4" for="edge" attr.name="description" attr.type="string"/>\n')
        f.write('<graph edgedefault="undirected">\n')
        has_edge_desc = "description" in edges.columns
        for r in nodes.toLocalIterator():
            f.write(
                f'<node id="{_attr(r["name"])}">'
                f'<data key="d0">{escape(r["type"] or "")}</data>'
                f'<data key="d1">{escape((r["description"] or "")[:500])}</data>'
                f"</node>\n"
            )
        for r in edges.toLocalIterator():
            # a null weight must not serialize as the string 'None'
            # inside an attr.type=double element (unparseable on read)
            w = "" if r["weight"] is None else r["weight"]
            desc = (
                f'<data key="d4">{escape((r["description"] or "")[:500])}</data>'
                if has_edge_desc
                else ""
            )
            f.write(
                f'<edge source="{_attr(r["src"])}" target="{_attr(r["tgt"])}">'
                f'<data key="d2">{w}</data>'
                f'<data key="d3">{escape(r["keywords"] or "")}</data>'
                f"{desc}"
                f"</edge>\n"
            )
        f.write("</graph>\n</graphml>\n")


def centrality_to_xlsx(
    centrality: DataFrame, path: str, limit: int = -1
) -> None:
    """Centrality scores as an Excel workbook — the reference's
    ``data.to_excel(buffer, index=True, header=True)`` surface
    (lightrag_centrality.py:86-96 with its ``limit > 0 → head(limit)``).

    Written as minimal OOXML directly (a .xlsx is a zip of XML parts)
    so the export has no optional-dependency gap in this image; numbers
    are numeric cells, everything else inline strings. Driver-side by
    design — exports are a human/tool compatibility boundary.
    """
    _check_size(centrality, "centrality")
    df = centrality
    if limit > 0:
        df = df.limit(limit)
    rows = df.collect()
    cols = df.columns

    def cell(ref: str, v) -> str:
        if v is None or v == "":
            return f'<c r="{ref}"/>'
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        return f'<c r="{ref}" t="inlineStr"><is><t>{escape(str(v))}</t></is></c>'

    def col_ref(ix: int) -> str:  # 0 → A, 26 → AA
        out = ""
        ix += 1
        while ix:
            ix, rem = divmod(ix - 1, 26)
            out = chr(ord("A") + rem) + out
        return out

    sheet_rows = []
    header = [""] + cols  # leading index column, as to_excel(index=True)
    sheet_rows.append(
        "<row r=\"1\">"
        + "".join(cell(f"{col_ref(i)}1", h) for i, h in enumerate(header))
        + "</row>"
    )
    for rix, r in enumerate(rows, start=2):
        vals = [rix - 2] + [r[c] for c in cols]
        sheet_rows.append(
            f'<row r="{rix}">'
            + "".join(cell(f"{col_ref(i)}{rix}", v) for i, v in enumerate(vals))
            + "</row>"
        )
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>" + "".join(sheet_rows) + "</sheetData></worksheet>"
    )
    import zipfile

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            "</Types>",
        )
        z.writestr(
            "_rels/.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
            "</Relationships>",
        )
        z.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>',
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
            "</Relationships>",
        )
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def graph_to_html(
    nodes: DataFrame, edges: DataFrame, path: str, max_nodes: int = 2000
) -> None:
    """G10 — interactive HTML graph visualization, the pyvis surface
    (lightrag_visualization.py:12-44: pyvis Network over the nx graph,
    per-node colors, physics layout, .show(path)). Self-contained
    output: embedded JSON + a small canvas force-directed layout — no
    pyvis/js-CDN dependency. Documented deviation: node colors are
    md5-derived (deterministic) instead of random.randint, so reruns
    produce identical files. Driver-side compatibility boundary; capped
    at ``max_nodes`` highest-degree nodes like any sane viewer."""
    import hashlib
    import json as _json

    top = nodes.orderBy(F.desc("degree"), "name").limit(max_nodes).collect() \
        if "degree" in nodes.columns else nodes.limit(max_nodes).collect()
    keep = {r["name"] for r in top}
    ns = [
        {
            "id": r["name"],
            "label": r["name"],
            "title": (r["description"] or "")[:200] if "description" in nodes.columns else "",
            "color": "#" + hashlib.md5(r["name"].encode()).hexdigest()[:6],
        }
        for r in top
    ]
    # filter to the kept node set IN SPARK before collecting: edges are
    # unbounded (nodes are capped at max_nodes, edges are not) and a
    # driver-side 'in keep' filter would first materialize every edge
    keep_df = nodes.sparkSession.createDataFrame(
        [(k,) for k in sorted(keep)], "name string"
    )
    kept_edges = (
        edges.select("src", "tgt", "weight")
        .join(F.broadcast(keep_df.withColumnRenamed("name", "src")), "src")
        .join(F.broadcast(keep_df.withColumnRenamed("name", "tgt")), "tgt")
        .collect()
    )
    es = [
        # explicit None check: a legitimate weight of 0.0 is falsy and
        # must not render as 1.0
        {
            "from": r["src"],
            "to": r["tgt"],
            "value": float(r["weight"]) if r["weight"] is not None else 1.0,
        }
        for r in kept_edges
    ]
    # '</' must not appear verbatim inside the <script> element: a node
    # description containing '</script>' would otherwise terminate the
    # block and inject markup into the viewer (json.dumps does not
    # escape '/')
    payload = _json.dumps({"nodes": ns, "edges": es}).replace("</", "<\\/")
    html = f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>knowledge graph</title></head>
<body style="margin:0"><canvas id="c"></canvas><script>
const data = {payload};
const cv = document.getElementById('c'), cx = cv.getContext('2d');
cv.width = innerWidth; cv.height = innerHeight;
const idx = new Map(data.nodes.map((n,i)=>[n.id,i]));
const P = data.nodes.map((n,i)=>({{x: cv.width/2 + Math.cos(i*2.4)*i*2,
                                   y: cv.height/2 + Math.sin(i*2.4)*i*2,
                                   vx:0, vy:0}}));
function step() {{
  for (let i=0;i<P.length;i++) for (let j=i+1;j<P.length;j++) {{
    let dx=P[j].x-P[i].x, dy=P[j].y-P[i].y, d2=dx*dx+dy*dy+0.01, f=800/d2;
    P[i].vx-=dx*f; P[i].vy-=dy*f; P[j].vx+=dx*f; P[j].vy+=dy*f;
  }}
  for (const e of data.edges) {{
    const a=P[idx.get(e.from)], b=P[idx.get(e.to)];
    const dx=b.x-a.x, dy=b.y-a.y;
    a.vx+=dx*0.002; a.vy+=dy*0.002; b.vx-=dx*0.002; b.vy-=dy*0.002;
  }}
  for (const p of P) {{ p.x+=p.vx*=0.85; p.y+=p.vy*=0.85; }}
  cx.clearRect(0,0,cv.width,cv.height);
  cx.strokeStyle='#ccc';
  for (const e of data.edges) {{
    const a=P[idx.get(e.from)], b=P[idx.get(e.to)];
    cx.beginPath(); cx.moveTo(a.x,a.y); cx.lineTo(b.x,b.y); cx.stroke();
  }}
  data.nodes.forEach((n,i)=>{{
    cx.fillStyle=n.color;
    cx.beginPath(); cx.arc(P[i].x,P[i].y,4,0,7); cx.fill();
  }});
  requestAnimationFrame(step);
}}
step();
</script></body></html>"""
    with open(path, "w", encoding="utf-8") as f:
        f.write(html)


def read_gexf(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Scan side of the gexf sink: parse a gexf file back into
    (nodes(id, label), edges(source, target)) DataFrames — used by the
    kg_export_gexf hash oracle to prove write→parse is lossless
    (incl. XML escaping)."""
    import xml.etree.ElementTree as ET

    from pyspark.sql import types as T

    root = ET.parse(path).getroot()
    ns = {"g": root.tag.split("}")[0].strip("{")} if "}" in root.tag else {}
    pre = "g:" if ns else ""
    nodes = [
        (el.get("id"), el.get("label"))
        for el in root.findall(f".//{pre}node", ns)
    ]
    edges = [
        (el.get("source"), el.get("target"))
        for el in root.findall(f".//{pre}edge", ns)
    ]
    nschema = T.StructType(
        [T.StructField("id", T.StringType()), T.StructField("label", T.StringType())]
    )
    eschema = T.StructType(
        [T.StructField("source", T.StringType()), T.StructField("target", T.StringType())]
    )
    return (
        spark.createDataFrame(nodes, nschema),
        spark.createDataFrame(edges, eschema),
    )


def read_xlsx(spark, path: str) -> DataFrame:
    """Scan side of the xlsx sink: parse the OOXML worksheet written by
    centrality_to_xlsx back into a DataFrame with the original columns
    (the leading to_excel-style index column is dropped). All cells come
    back as strings — the hash oracle casts explicitly, proving the
    numeric round trip at the text level."""
    import xml.etree.ElementTree as ET
    import zipfile

    from pyspark.sql import types as T

    with zipfile.ZipFile(path) as z:
        sheet = z.read("xl/worksheets/sheet1.xml").decode("utf-8")
    root = ET.fromstring(sheet)
    ns = {"m": root.tag.split("}")[0].strip("{")}

    def cell_text(c) -> str | None:
        v = c.find("m:v", ns)
        if v is not None:
            return v.text or ""
        t = c.find("m:is/m:t", ns)
        if t is not None:
            return t.text or ""
        return None

    def col_ix(ref: str) -> int:
        ix = 0
        for ch in ref:
            if ch.isalpha():
                ix = ix * 26 + (ord(ch.upper()) - ord("A") + 1)
        return ix - 1

    rows = []
    for row in root.findall(".//m:row", ns):
        cells: dict[int, str | None] = {}
        for c in row.findall("m:c", ns):
            cells[col_ix(c.get("r", "A"))] = cell_text(c)
        width = max(cells) + 1 if cells else 0
        rows.append([cells.get(i) for i in range(width)])
    header, body = rows[0], rows[1:]
    cols = header[1:]  # drop the index column
    data = [tuple(r[1 : len(header)]) for r in body]
    schema = T.StructType([T.StructField(c, T.StringType()) for c in cols])
    return spark.createDataFrame(data, schema)


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
            f.write(f'<node id="{_attr(r["cluster"])}" label="{_attr(r["cluster"])}"/>\n')
        f.write("</nodes>\n<edges>\n")
        for i, r in enumerate(rows):
            if r["parent_cluster"]:
                f.write(
                    f'<edge id="{i}" source="{_attr(r["cluster"])}" '
                    f'target="{_attr(r["parent_cluster"])}"/>\n'
                )
        f.write("</edges>\n</graph>\n</gexf>\n")
