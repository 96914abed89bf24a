package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.immutable.ListMap

/**
 * Driver contract — one `queries` entry per implemented operator (SURVEY.md §2)
 * plus the LLM-pipeline operators. Oracles are plain DuckDB SQL (the oracle
 * DB has no spatial extension), so every geometric query is built from integer
 * coordinates whose expected value is computable arithmetically — exact
 * areas/lengths/predicates, concatenated WKT/GeoJSON strings. Entries with no
 * SQL-expressible oracle (hilbert, quadkey, minhash, …) are present without an
 * `oracleSql` row (driver records the weaker rows-only check) and are covered
 * by ScalaTest instead.
 */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    Graft.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").createOrReplaceTempView("lineitem")
    spark.sql("""
      SELECT l_returnflag,
             count(*) AS n,
             st_astext(st_extent_agg(pt)) AS extent,
             cast(st_area(st_union_agg(st_makeenvelope(x, y, x + 1.0d, y + 1.0d))) as double) AS union_area
      FROM (SELECT l_returnflag,
                   cast(l_partkey % 100 AS DOUBLE) AS x,
                   cast(l_suppkey % 100 AS DOUBLE) AS y,
                   st_point(cast(l_partkey % 100 AS DOUBLE), cast(l_suppkey % 100 AS DOUBLE)) AS pt
            FROM lineitem)
      WHERE st_within(pt, st_makeenvelope(-1.0d, -1.0d, 90.0d, 90.0d))
      GROUP BY l_returnflag
      ORDER BY l_returnflag""")
  }

  private def q(tables: String*)(sql: String): (SparkSession, String) => DataFrame =
    (s: SparkSession, dir: String) => {
      Graft.register(s)
      // events.parquet carries TIMESTAMP(NANOS); read as epoch-nanos LongType
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      tables.foreach { t =>
        val path = s"$dir/$t.parquet"
        val df = s.read.parquet(path)
        // The testdata files are single-row-group parquet, so the scan yields
        // one task no matter the split config — a local-bench artifact. Fan
        // small inputs out to the cores; at production scale inputs have
        // thousands of row groups and this branch never fires.
        val small = new java.io.File(path).length < (256L << 20)
        val fanned =
          if (small) df.repartition(s.sparkContext.defaultParallelism) else df
        fanned.createOrReplaceTempView(t)
      }
      s.sql(sql)
    }

  // shorthand used across queries: per-lineitem unique key and small ints
  private val K = "l_orderkey * 10 + l_linenumber"

  def queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(

    // ---------------------------------------------------------- constructors & formats
    "q_point_xy" -> q("lineitem")(s"""
      SELECT $K AS k,
             st_x(st_point(cast(l_partkey AS DOUBLE), cast(l_suppkey AS DOUBLE))) AS x,
             st_y(st_point(cast(l_partkey AS DOUBLE), cast(l_suppkey AS DOUBLE))) AS y
      FROM lineitem ORDER BY k"""),

    "q_astext_point" -> q("lineitem")(s"""
      SELECT $K AS k,
             st_astext(st_point(cast(l_partkey AS DOUBLE), cast(l_suppkey AS DOUBLE))) AS wkt
      FROM lineitem ORDER BY k"""),

    "q_wkt_roundtrip" -> q("lineitem")(s"""
      SELECT $K AS k,
             st_astext(st_geomfromtext(
               'LINESTRING (' || (l_partkey % 50) || ' ' || (l_suppkey % 50) || ', '
                              || ((l_partkey % 50) + 10) || ' ' || ((l_suppkey % 50) + 7) || ')')) AS wkt
      FROM lineitem ORDER BY k"""),

    "q_wkb_roundtrip" -> q("lineitem")(s"""
      SELECT $K AS k,
             st_astext(st_geomfromwkb(st_aswkb(st_point(cast(l_partkey AS DOUBLE), cast(l_suppkey AS DOUBLE))))) AS wkt
      FROM lineitem ORDER BY k"""),

    "q_hexwkb_roundtrip" -> q("lineitem")(s"""
      SELECT $K AS k,
             st_astext(st_geomfromhexwkb(st_ashexwkb(st_point(cast(l_partkey AS DOUBLE), cast(l_suppkey AS DOUBLE))))) AS wkt
      FROM lineitem ORDER BY k"""),

    "q_geojson" -> q("lineitem")(s"""
      SELECT $K AS k,
             st_asgeojson(st_point(cast(l_partkey AS DOUBLE), cast(l_suppkey AS DOUBLE))) AS gj,
             st_astext(st_geomfromgeojson(
               '{"type":"Point","coordinates":[' || (l_partkey % 90) || ',' || (l_suppkey % 90) || ']}')) AS wkt
      FROM lineitem ORDER BY k"""),

    // ---------------------------------------------------------- measures
    "q_area_perimeter" -> q("lineitem")(s"""
      SELECT $K AS k,
             st_area(st_makeenvelope(0.0d, 0.0d, cast(l_partkey % 97 AS DOUBLE), cast(l_suppkey % 89 AS DOUBLE))) AS area,
             st_perimeter(st_makeenvelope(0.0d, 0.0d, cast(l_partkey % 97 AS DOUBLE), cast(l_suppkey % 89 AS DOUBLE))) AS perim
      FROM lineitem ORDER BY k"""),

    "q_length_distance" -> q("lineitem")(s"""
      SELECT $K AS k,
             st_length(st_makeline(st_point(0.0d, 0.0d),
                                   st_point(cast(l_partkey % 13 AS DOUBLE), cast(l_suppkey % 17 AS DOUBLE)))) AS len,
             st_distance(st_point(0.0d, 0.0d),
                         st_point(cast(l_partkey % 13 AS DOUBLE), cast(l_suppkey % 17 AS DOUBLE))) AS dist,
             st_dwithin(st_point(0.0d, 0.0d),
                        st_point(cast(l_partkey % 13 AS DOUBLE), cast(l_suppkey % 17 AS DOUBLE)), 10.0d) AS near
      FROM lineitem ORDER BY k"""),

    "q_centroid" -> q("lineitem")(s"""
      SELECT $K AS k,
             st_x(st_centroid(st_makeenvelope(cast(l_partkey % 20 AS DOUBLE), cast(l_suppkey % 20 AS DOUBLE),
                                              cast(l_partkey % 20 AS DOUBLE) + 6.0d, cast(l_suppkey % 20 AS DOUBLE) + 8.0d))) AS cx,
             st_y(st_centroid(st_makeenvelope(cast(l_partkey % 20 AS DOUBLE), cast(l_suppkey % 20 AS DOUBLE),
                                              cast(l_partkey % 20 AS DOUBLE) + 6.0d, cast(l_suppkey % 20 AS DOUBLE) + 8.0d))) AS cy
      FROM lineitem ORDER BY k"""),

    // ---------------------------------------------------------- predicates
    "q_predicates" -> q("lineitem")(s"""
      SELECT k,
             st_intersects(st_makeenvelope(ax, ay, ax + 5.0d, ay + 5.0d), st_makeenvelope(3.0d, 3.0d, 8.0d, 8.0d)) AS inter,
             st_contains(st_makeenvelope(3.0d, 3.0d, 8.0d, 8.0d), st_point(ax, ay)) AS cont,
             st_within(st_point(ax, ay), st_makeenvelope(3.0d, 3.0d, 8.0d, 8.0d)) AS wthn,
             st_disjoint(st_makeenvelope(ax, ay, ax + 5.0d, ay + 5.0d), st_makeenvelope(3.0d, 3.0d, 8.0d, 8.0d)) AS disj,
             st_intersects_extent(st_makeenvelope(ax, ay, ax + 5.0d, ay + 5.0d), st_makeenvelope(3.0d, 3.0d, 8.0d, 8.0d)) AS interx
      FROM (SELECT $K AS k, cast(l_partkey % 10 AS DOUBLE) AS ax, cast(l_suppkey % 10 AS DOUBLE) AS ay FROM lineitem)
      ORDER BY k"""),

    "q_overlay_area" -> q("lineitem")(s"""
      SELECT k,
             st_area(st_intersection(st_makeenvelope(a, 0.0d, a + 10.0d, 10.0d), st_makeenvelope(5.0d, 2.0d, 15.0d, 9.0d))) AS inter_area,
             st_area(st_union(st_makeenvelope(a, 0.0d, a + 10.0d, 10.0d), st_makeenvelope(5.0d, 2.0d, 15.0d, 9.0d))) AS union_area,
             st_area(st_difference(st_makeenvelope(a, 0.0d, a + 10.0d, 10.0d), st_makeenvelope(5.0d, 2.0d, 15.0d, 9.0d))) AS diff_area
      FROM (SELECT $K AS k, cast(l_partkey % 12 AS DOUBLE) AS a FROM lineitem)
      ORDER BY k"""),

    "q_convexhull" -> q("lineitem")(s"""
      SELECT $K AS k,
             st_area(st_convexhull(st_geomfromtext(
               'MULTIPOINT (0 0, ' || ((l_partkey % 20) + 2) || ' 0, 0 ' || ((l_suppkey % 20) + 2) || ', 1 1)'))) AS hull_area
      FROM lineitem ORDER BY k"""),

    "q_makepolygon" -> q("lineitem")(s"""
      SELECT $K AS k,
             st_area(st_makepolygon(st_geomfromtext(
               'LINESTRING (0 0, ' || ((l_partkey % 30) + 1) || ' 0, ' || ((l_partkey % 30) + 1) || ' '
                 || ((l_suppkey % 30) + 1) || ', 0 0)'))) AS area,
             st_isvalid(st_makepolygon(st_geomfromtext(
               'LINESTRING (0 0, ' || ((l_partkey % 30) + 1) || ' 0, ' || ((l_partkey % 30) + 1) || ' '
                 || ((l_suppkey % 30) + 1) || ', 0 0)'))) AS valid
      FROM lineitem ORDER BY k"""),

    // ---------------------------------------------------------- accessors / transforms
    "q_line_accessors" -> q("lineitem")(s"""
      SELECT k,
             st_astext(st_startpoint(ln)) AS sp,
             st_astext(st_endpoint(ln)) AS ep,
             st_astext(st_pointn(ln, 2)) AS p2,
             st_npoints(ln) AS np,
             st_isclosed(ln) AS closed,
             st_geometrytype(ln) AS gtype,
             st_dimension(ln) AS dim,
             st_isempty(ln) AS empt
      FROM (SELECT $K AS k,
                   st_geomfromtext('LINESTRING (' || (l_partkey % 40) || ' ' || (l_suppkey % 40) || ', '
                     || ((l_partkey % 40) + 3) || ' ' || ((l_suppkey % 40) + 4) || ', 0 0)') AS ln
            FROM lineitem)
      ORDER BY k"""),

    "q_envelope_ring" -> q("lineitem")(s"""
      SELECT k,
             st_astext(st_exteriorring(env)) AS ring,
             st_ninteriorrings(env) AS nrings,
             st_xmin(env) AS xmin, st_ymin(env) AS ymin, st_xmax(env) AS xmax, st_ymax(env) AS ymax
      FROM (SELECT $K AS k,
                   st_makeenvelope(0.0d, 0.0d, cast((l_partkey % 40) + 1 AS DOUBLE), cast((l_suppkey % 40) + 1 AS DOUBLE)) AS env
            FROM lineitem)
      ORDER BY k"""),

    "q_extent_struct" -> q("lineitem")(s"""
      SELECT k, e.min_x AS minx, e.min_y AS miny, e.max_x AS maxx, e.max_y AS maxy
      FROM (SELECT $K AS k,
                   st_extent(st_makeenvelope(cast(l_partkey % 7 AS DOUBLE), cast(l_suppkey % 7 AS DOUBLE),
                                             cast(l_partkey % 7 AS DOUBLE) + 2.0d, cast(l_suppkey % 7 AS DOUBLE) + 3.0d)) AS e
            FROM lineitem)
      ORDER BY k"""),

    "q_flip_multi_reverse" -> q("lineitem")(s"""
      SELECT $K AS k,
             st_astext(st_flipcoordinates(st_point(cast(l_partkey % 30 AS DOUBLE), cast(l_suppkey % 30 AS DOUBLE)))) AS flipped,
             st_astext(st_multi(st_point(cast(l_partkey % 30 AS DOUBLE), cast(l_suppkey % 30 AS DOUBLE)))) AS multi,
             st_astext(st_reverse(st_geomfromtext('LINESTRING (' || (l_partkey % 30) || ' 0, 0 ' || (l_suppkey % 30) || ')'))) AS rev,
             st_ngeometries(st_multi(st_point(1.0d, 1.0d))) AS ngeom
      FROM lineitem ORDER BY k"""),

    "q_force_dims" -> q("lineitem")(s"""
      SELECT $K AS k,
             st_astext(st_force3dz(st_point(cast(l_partkey % 30 AS DOUBLE), cast(l_suppkey % 30 AS DOUBLE)),
                                   cast(l_linenumber AS DOUBLE))) AS z3,
             st_astext(st_force2d(st_geomfromtext('POINT Z (' || (l_partkey % 30) || ' ' || (l_suppkey % 30) || ' 5)'))) AS back2d,
             st_hasz(st_geomfromtext('POINT Z (1 2 3)')) AS hz,
             st_zmflag(st_geomfromtext('POINT Z (1 2 3)')) AS zmf,
             st_z(st_geomfromtext('POINT Z (1 2 ' || (l_partkey % 9) || ')')) AS zval
      FROM lineitem ORDER BY k"""),

    "q_collect_array" -> q("lineitem")(s"""
      SELECT $K AS k,
             st_astext(st_collect(array(
               st_point(cast(l_partkey % 25 AS DOUBLE), 0.0d),
               st_point(0.0d, cast(l_suppkey % 25 AS DOUBLE))))) AS mp
      FROM lineitem ORDER BY k"""),

    "q_dump" -> q("lineitem")(s"""
      SELECT k, st_astext(d.geom) AS part_wkt
      FROM (SELECT $K AS k,
                   explode(st_dump(st_geomfromtext(
                     'MULTIPOINT (' || (l_partkey % 35) || ' 0, 7 ' || (l_suppkey % 35) || ')'))) AS d
            FROM lineitem)
      ORDER BY k, part_wkt"""),

    "q_simplify_valid" -> q("lineitem")(s"""
      SELECT $K AS k,
             st_npoints(st_simplify(st_geomfromtext(
               'LINESTRING (0 0, ' || (l_partkey % 10) || ' 0, ' || (2 * (l_partkey % 10)) || ' 0)'), 0.5d)) AS np_simpl,
             st_isvalid(st_geomfromtext('POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))')) AS bowtie_valid,
             st_area(st_makevalid(st_geomfromtext('POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))'))) AS fixed_area
      FROM lineitem ORDER BY k"""),

    "q_buffer" -> q("lineitem")(s"""
      SELECT $K AS k,
             st_npoints(st_buffer(st_point(cast(l_partkey % 40 AS DOUBLE), cast(l_suppkey % 40 AS DOUBLE)), 1.0d, 8)) AS np
      FROM lineitem ORDER BY k"""),

    "q_accessors_zm" -> q("lineitem")(s"""
      SELECT k,
             st_z(g) AS z, st_m(g) AS m, st_zmax(g) AS zmax, st_mmin(g) AS mmin,
             st_hasm(g) AS hm, st_zmflag(g) AS zmf,
             st_astext(st_force2d(g)) AS t2d
      FROM (SELECT $K AS k,
                   st_geomfromtext('POINT ZM (' || (l_partkey % 50) || ' ' || (l_suppkey % 50) || ' '
                     || l_linenumber || ' ' || (l_orderkey % 100) || ')') AS g
            FROM lineitem)
      ORDER BY k"""),

    "q_shapes2" -> q("lineitem")(s"""
      SELECT k,
             st_x(st_pointonsurface(env1)) AS posx, st_y(st_pointonsurface(env1)) AS posy,
             st_length(st_shortestline(env1, env2)) AS gap,
             st_maxdistance(env1, env2) AS maxd,
             st_astext(st_boundary(env2)) AS bound,
             st_astext(st_linemerge(st_geomfromtext(
               'MULTILINESTRING ((0 0, ' || a1 || ' 0), (' || a1 || ' 0, ' || a1 || ' ' || b1 || '))'))) AS merged
      FROM (SELECT $K AS k,
                   cast(l_partkey % 15 AS DOUBLE) AS a, cast(l_suppkey % 15 AS DOUBLE) AS b,
                   (l_partkey % 15) + 1 AS a1, (l_suppkey % 15) + 1 AS b1,
                   st_makeenvelope(cast(l_partkey % 15 AS DOUBLE), cast(l_suppkey % 15 AS DOUBLE),
                                   cast(l_partkey % 15 AS DOUBLE) + 6.0d, cast(l_suppkey % 15 AS DOUBLE) + 8.0d) AS env1,
                   st_makeenvelope(cast(l_partkey % 15 AS DOUBLE) + 10.0d, cast(l_suppkey % 15 AS DOUBLE),
                                   cast(l_partkey % 15 AS DOUBLE) + 12.0d, cast(l_suppkey % 15 AS DOUBLE) + 2.0d) AS env2
            FROM lineitem)
      ORDER BY k"""),

    "q_predicates2" -> q("lineitem")(s"""
      SELECT k,
             st_touches(a, b) AS tch,
             st_overlaps(a, b) AS ovl,
             st_contains(a, b) AS cnt,
             st_containsproperly(a, b) AS cntp,
             st_covers(a, b) AS cov,
             st_within(b, a) AS wth,
             st_crosses(a, b) AS crs
      FROM (SELECT $K AS k,
                   st_makeenvelope(cast(l_partkey % 8 AS DOUBLE), cast(l_suppkey % 8 AS DOUBLE),
                                   cast(l_partkey % 8 AS DOUBLE) + 4.0d, cast(l_suppkey % 8 AS DOUBLE) + 4.0d) AS a,
                   st_makeenvelope(4.0d, 4.0d, 6.0d, 6.0d) AS b
            FROM lineitem)
      ORDER BY k"""),

    "q_norm_reduce" -> q("lineitem")(s"""
      SELECT $K AS k,
             st_astext(st_normalize(st_geomfromtext(
               'MULTIPOINT (' || ((l_partkey % 20) + 10) || ' 0, 5 5, 0 0)'))) AS norm,
             st_astext(st_reduceprecision(st_point(cast(l_partkey % 40 AS DOUBLE) + 0.25d,
                                                   cast(l_suppkey % 40 AS DOUBLE) + 0.75d), 1.0d)) AS red,
             st_npoints(st_removerepeatedpoints(st_geomfromtext(
               'LINESTRING (0 0, 0 0, ' || (l_partkey % 9) || ' 5, ' || (l_partkey % 9) || ' 5, 9 9)'))) AS ndedup,
             st_astext(st_points(st_makeenvelope(0.0d, 0.0d,
               cast((l_partkey % 30) + 1 AS DOUBLE), cast((l_suppkey % 30) + 1 AS DOUBLE)))) AS pts,
             st_isring(st_exteriorring(st_makeenvelope(0.0d, 0.0d, 1.0d, 1.0d))) AS ring,
             st_issimple(st_geomfromtext('LINESTRING (0 0, 2 2, 2 0, 0 2)')) AS simp
      FROM lineitem ORDER BY k"""),

    "q_svg" -> q("lineitem")(s"""
      SELECT $K AS k,
             st_assvg(st_point(cast(l_partkey % 30 AS DOUBLE), cast(l_suppkey % 30 AS DOUBLE))) AS svg_pt,
             st_assvg(st_point(cast(l_partkey % 30 AS DOUBLE), cast(l_suppkey % 30 AS DOUBLE)), true) AS svg_rel,
             st_assvg(st_makeenvelope(0.0d, 0.0d,
               cast((l_partkey % 30) + 1 AS DOUBLE), cast((l_suppkey % 30) + 1 AS DOUBLE))) AS svg_poly
      FROM lineitem ORDER BY k"""),

    // ---------------------------------------------------------- geodesy / CRS
    "q_haversine" -> q("lineitem")(s"""
      SELECT $K AS k,
             round(st_haversine(cast(l_partkey % 120 AS DOUBLE) - 60.0d, cast(l_suppkey % 120 AS DOUBLE) - 60.0d,
                                cast(l_partkey % 90 AS DOUBLE) - 45.0d, cast(l_suppkey % 90 AS DOUBLE) - 45.0d), 3) AS hav_m
      FROM lineitem ORDER BY k"""),

    "q_transform" -> q("lineitem")(s"""
      SELECT k,
             round(st_x(st_transform(st_point(lon, lat), 'OGC:CRS84', 'EPSG:3857')), 4) AS mx,
             round(st_y(st_transform(st_point(lon, lat), 'OGC:CRS84', 'EPSG:3857')), 4) AS my
      FROM (SELECT $K AS k, cast(l_partkey % 300 AS DOUBLE) - 150.0d AS lon, cast(l_suppkey % 160 AS DOUBLE) - 80.0d AS lat
            FROM lineitem)
      ORDER BY k"""),

    // ---------------------------------------------------------- aggregates
    "q_extent_agg" -> q("lineitem")("""
      SELECT l_returnflag AS flag,
             st_xmin(st_extent_agg(st_point(cast(l_partkey AS DOUBLE), cast(l_suppkey AS DOUBLE)))) AS xmin,
             st_xmax(st_extent_agg(st_point(cast(l_partkey AS DOUBLE), cast(l_suppkey AS DOUBLE)))) AS xmax,
             st_ymin(st_extent_agg(st_point(cast(l_partkey AS DOUBLE), cast(l_suppkey AS DOUBLE)))) AS ymin,
             st_ymax(st_extent_agg(st_point(cast(l_partkey AS DOUBLE), cast(l_suppkey AS DOUBLE)))) AS ymax
      FROM lineitem GROUP BY l_returnflag ORDER BY flag"""),

    "q_union_agg" -> q("lineitem")("""
      SELECT l_returnflag AS flag,
             st_area(st_union_agg(st_makeenvelope(cast(l_partkey % 100 AS DOUBLE) * 10.0d, 0.0d,
                                                  cast(l_partkey % 100 AS DOUBLE) * 10.0d + 5.0d, 5.0d))) AS area
      FROM lineitem GROUP BY l_returnflag ORDER BY flag"""),

    "q_intersection_agg" -> q("lineitem")("""
      SELECT l_returnflag AS flag,
             st_area(st_intersection_agg(st_makeenvelope(0.0d, 0.0d,
               100.0d + cast(l_partkey % 10 AS DOUBLE), 100.0d + cast(l_suppkey % 10 AS DOUBLE)))) AS area
      FROM lineitem GROUP BY l_returnflag ORDER BY flag"""),

    "q_collect_agg" -> q("lineitem")("""
      SELECT l_returnflag AS flag,
             st_ngeometries(st_collect_agg(st_point(cast(l_partkey AS DOUBLE), cast(l_suppkey AS DOUBLE)))) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY flag"""),

    // ---------------------------------------------------------- spatial join (tile-join rewrite)
    "q_spatial_join" -> q("lineitem", "supplier")("""
      SELECT p.k, e.cell
      FROM (SELECT l_orderkey * 10 + l_linenumber AS k,
                   st_point(cast(l_partkey % 100 AS DOUBLE), cast(l_suppkey % 100 AS DOUBLE)) AS pt
            FROM lineitem WHERE l_orderkey % 37 = 0) p
      JOIN (SELECT s_suppkey AS cell,
                   st_makeenvelope(cast((s_suppkey % 10) * 10 AS DOUBLE), cast(((s_suppkey DIV 10) % 10) * 10 AS DOUBLE),
                                   cast((s_suppkey % 10) * 10 + 10 AS DOUBLE), cast(((s_suppkey DIV 10) % 10) * 10 + 10 AS DOUBLE)) AS env
            FROM supplier) e
      ON st_contains(e.env, p.pt)
      ORDER BY p.k, e.cell"""),

    // ---------------------------------------------------------- relational parity (windows, built-ins)
    "q_sessionize" -> q("events")("""
      SELECT user_id,
             cast(sum(new_sess) AS INT) AS sessions,
             cast(count(*) AS INT) AS events
      FROM (SELECT user_id,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                          OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000000
                        THEN 1 ELSE 0 END AS new_sess
            FROM events)
      GROUP BY user_id ORDER BY user_id"""),

    "q_event_stats" -> q("events")("""
      SELECT event_type, cast(count(*) AS INT) AS n, min(value) AS vmin, max(value) AS vmax
      FROM events GROUP BY event_type ORDER BY event_type"""),

    // ---------------------------------------------------------- LLM pipeline: dedup
    "q_dedup_exact" -> q("documents")("""
      SELECT doc_id, cast(cnt AS INT) AS group_size
      FROM (SELECT doc_id,
                   row_number() OVER (PARTITION BY norm ORDER BY doc_id) AS rn,
                   count(*) OVER (PARTITION BY norm) AS cnt
            FROM (SELECT doc_id, norm_text(text) AS norm FROM documents))
      WHERE rn = 1 ORDER BY doc_id"""),

    "q_ngram_jaccard" -> q("documents")("""
      SELECT a.doc_id AS da, b.doc_id AS db,
             jaccard_word_ngrams(a.text, b.text, 2) AS j
      FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      ORDER BY da"""),

    "q_minhash_neardup" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      s.read.parquet(s"$dir/documents.parquet")
        .repartition(s.sparkContext.defaultParallelism)
        .createOrReplaceTempView("documents")
      // Signatures are computed ONCE and cached: the LSH self-join would
      // otherwise re-evaluate the minhash on both join sides. At 100 TB this
      // is a checkpointed intermediate table; locally, .cache() models it.
      val sigs = s.sql("""
        SELECT doc_id, char_shingles(text, 5) AS sh,
               minhash_lsh_buckets(text, 64, 5, 16, 42) AS bs
        FROM (SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000 AS doc_id,
                     substr(text, 1, greatest(length(text) - 5, 10)) AS text
              FROM documents)""").cache()
      sigs.createOrReplaceTempView("sigs")
      s.sql("""
        WITH buckets AS (
          SELECT doc_id, b FROM (SELECT doc_id, explode(bs) AS b FROM sigs)
        ),
        cand AS (
          SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
          FROM buckets x JOIN buckets y ON x.b = y.b AND x.doc_id < y.doc_id
        )
        SELECT da, db, round(j, 6) AS j
        FROM (SELECT c.da, c.db, jaccard_arrays(ta.sh, tb.sh) AS j
              FROM cand c
              JOIN sigs ta ON c.da = ta.doc_id
              JOIN sigs tb ON c.db = tb.doc_id)
        WHERE j >= 0.5d
        ORDER BY da, db""")
    }),

    "q_simhash" -> q("documents")("""
      SELECT a.doc_id,
             simhash(a.text, 4) AS sh,
             cast(bit_count(simhash(a.text, 4) ^ simhash(b.text, 4)) AS INT) AS hamming_next
      FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      ORDER BY a.doc_id"""),

    // ---------------------------------------------------------- LLM pipeline: text analysis
    "q_token_stats" -> q("documents")("""
      SELECT doc_id,
             token_count(text) AS toks,
             bpe_token_count(text) AS bpe_toks,
             cast(length(text) AS INT) AS chars
      FROM documents ORDER BY doc_id"""),

    "q_quality" -> q("documents")("""
      SELECT doc_id,
             punct_ratio(text) AS punct,
             digit_ratio(text) AS digits,
             upper_ratio(text) AS uppers,
             mean_token_len(text) AS mtl,
             stopword_ratio(text) AS stops
      FROM documents ORDER BY doc_id"""),

    "q_lang_id" -> q("documents")("""
      SELECT doc_id, lang_id(text) AS lang, doc_fingerprint(text) AS fp
      FROM documents ORDER BY doc_id"""),

    // ---------------------------------------------------------- LLM pipeline: similarity search
    "q_ann_bruteforce" -> q("embeddings")("""
      SELECT qid, nid
      FROM (SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
            FROM (SELECT q.vec_id AS qid, e.vec_id AS nid,
                         vec_cosine(cast(q.embedding AS ARRAY<DOUBLE>), cast(e.embedding AS ARRAY<DOUBLE>)) AS sim
                  FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
                  CROSS JOIN embeddings e
                  WHERE e.vec_id != q.vec_id))
      WHERE rn <= 3 ORDER BY qid, nid"""),

    // embedding-cosine near-dup: LSH bucket candidates → exact cosine verify.
    // The synthetic embeddings are near-orthogonal (max pair cosine 0.51), so
    // near-dups are constructed: each vector + a perturbed copy at id+100000.
    "q_embed_neardup" -> q("embeddings")("""
      WITH corpus AS (
        SELECT vec_id, cast(embedding AS array<double>) AS v FROM embeddings
        UNION ALL
        SELECT vec_id + 100000 AS vec_id,
               transform(cast(embedding AS array<double>), x -> x + 0.05d) AS v
        FROM embeddings
      ),
      bucketed AS (SELECT vec_id, v, rhp_lsh_bucket(v, 6, 11) AS bk FROM corpus)
      SELECT va, vb, round(sim, 6) AS sim
      FROM (SELECT a.vec_id AS va, b.vec_id AS vb, vec_cosine(a.v, b.v) AS sim
            FROM bucketed a JOIN bucketed b ON a.bk = b.bk AND a.vec_id < b.vec_id)
      WHERE sim >= 0.85d
      ORDER BY va, vb"""),

    "q_ann_ivf" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val cs = graft.ann.Ivf.centroids(emb, "vec_id", "embedding", k = 16, seed = 7)
      graft.ann.Ivf.search(emb, emb.where("vec_id < 10"), "vec_id", "embedding", cs,
          topK = 5, nprobe = 6)
        .selectExpr("qid", "nid", "rn").orderBy("qid", "rn")
    }),

    "q_ann_lsh" -> q("embeddings")("""
      SELECT bucket, cast(count(*) AS INT) AS n, cast(count(DISTINCT label) AS INT) AS labels
      FROM (SELECT rhp_lsh_bucket(cast(embedding AS ARRAY<DOUBLE>), 8, 7) AS bucket, label FROM embeddings)
      GROUP BY bucket ORDER BY bucket"""),

    // ---------------------------------------------------------- LLM pipeline: multimodal (stub decode)
    "q_multimodal" -> q("documents")("""
      SELECT doc_id, m.width AS width, m.height AS height, m.nbytes AS nbytes, m.format AS fmt
      FROM (SELECT doc_id, mm_decode_stub(cast(text AS BINARY)) AS m FROM documents)
      ORDER BY doc_id"""),

    // ---------------------------------------------------------- seeded generator (reference benchmark pin)
    "q_generatepoints_pin" -> q()("""
      SELECT cast(count(*) AS INT) AS n
      FROM (SELECT st_generatepoint(1337L, id, 0.0d, 0.0d, 10000.0d, 10000.0d) AS pt
            FROM range(10000000))
      WHERE st_within(pt, st_makeenvelope(450.0d, 450.0d, 650.0d, 650.0d))"""),

    // Indexed counterpart of the pin (reference rtree_points_index.benchmark):
    // same 10M points Hilbert-clustered with bbox stats; the filter prunes row
    // groups via BboxSkippingRule + parquet min/max instead of scanning all.
    "q_rtree_clustered_pin" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      val path = new java.io.File(
        System.getProperty("java.io.tmpdir"), "graft_rtree_10m").getAbsolutePath
      val marker = new java.io.File(path + "_OK")
      if (!marker.exists()) {
        val pts = s.sql(
          "SELECT point AS geom FROM st_generatepoints(0.0d, 0.0d, 10000.0d, 10000.0d, 10000000, 1337)")
        graft.io.GeoWriter.clusteredParquet(pts, "geom", path,
          bounds = Some((0.0, 0.0, 10000.0, 10000.0)), targetPartitions = 64)
        marker.createNewFile()
      }
      s.read.parquet(path).createOrReplaceTempView("rtree_pts")
      s.sql("""
        SELECT cast(count(*) AS INT) AS n FROM rtree_pts
        WHERE st_within(geom, st_makeenvelope(450.0d, 450.0d, 650.0d, 650.0d))""")
    }),

    // ---------------------------------------------------------- spatial keys (rows-only; pinned by ScalaTest)
    "q_hilbert_quadkey" -> q("lineitem")(s"""
      SELECT $K AS k,
             st_hilbert(cast(l_partkey % 100 AS DOUBLE), cast(l_suppkey % 100 AS DOUBLE), 0.0d, 0.0d, 100.0d, 100.0d) AS h,
             st_quadkey(cast(l_partkey % 300 AS DOUBLE) - 150.0d, cast(l_suppkey % 160 AS DOUBLE) - 80.0d, 8) AS qk
      FROM lineitem ORDER BY k""")
  )

  def oracleSql: Map[String, String] = ListMap(

    "q_point_xy" -> s"""
      SELECT $K AS k, CAST(l_partkey AS DOUBLE) AS x, CAST(l_suppkey AS DOUBLE) AS y
      FROM lineitem ORDER BY k""",

    "q_astext_point" -> s"""
      SELECT $K AS k, 'POINT (' || l_partkey || ' ' || l_suppkey || ')' AS wkt
      FROM lineitem ORDER BY k""",

    "q_wkt_roundtrip" -> s"""
      SELECT $K AS k,
             'LINESTRING (' || (l_partkey % 50) || ' ' || (l_suppkey % 50) || ', '
               || ((l_partkey % 50) + 10) || ' ' || ((l_suppkey % 50) + 7) || ')' AS wkt
      FROM lineitem ORDER BY k""",

    "q_wkb_roundtrip" -> s"""
      SELECT $K AS k, 'POINT (' || l_partkey || ' ' || l_suppkey || ')' AS wkt
      FROM lineitem ORDER BY k""",

    "q_hexwkb_roundtrip" -> s"""
      SELECT $K AS k, 'POINT (' || l_partkey || ' ' || l_suppkey || ')' AS wkt
      FROM lineitem ORDER BY k""",

    "q_geojson" -> s"""
      SELECT $K AS k,
             '{"type":"Point","coordinates":[' || l_partkey || ',' || l_suppkey || ']}' AS gj,
             'POINT (' || (l_partkey % 90) || ' ' || (l_suppkey % 90) || ')' AS wkt
      FROM lineitem ORDER BY k""",

    "q_area_perimeter" -> s"""
      SELECT $K AS k,
             CAST((l_partkey % 97) * (l_suppkey % 89) AS DOUBLE) AS area,
             CAST(2 * ((l_partkey % 97) + (l_suppkey % 89)) AS DOUBLE) AS perim
      FROM lineitem ORDER BY k""",

    "q_length_distance" -> s"""
      SELECT $K AS k,
             sqrt(CAST((l_partkey % 13) * (l_partkey % 13) + (l_suppkey % 17) * (l_suppkey % 17) AS DOUBLE)) AS len,
             sqrt(CAST((l_partkey % 13) * (l_partkey % 13) + (l_suppkey % 17) * (l_suppkey % 17) AS DOUBLE)) AS dist,
             (l_partkey % 13) * (l_partkey % 13) + (l_suppkey % 17) * (l_suppkey % 17) <= 100 AS near
      FROM lineitem ORDER BY k""",

    "q_centroid" -> s"""
      SELECT $K AS k,
             CAST(l_partkey % 20 AS DOUBLE) + 3.0 AS cx,
             CAST(l_suppkey % 20 AS DOUBLE) + 4.0 AS cy
      FROM lineitem ORDER BY k""",

    "q_predicates" -> s"""
      SELECT k,
             ax <= 8 AND ay <= 8 AS inter,
             ax > 3 AND ax < 8 AND ay > 3 AND ay < 8 AS cont,
             ax > 3 AND ax < 8 AND ay > 3 AND ay < 8 AS wthn,
             ax > 8 OR ay > 8 AS disj,
             ax <= 8 AND ay <= 8 AS interx
      FROM (SELECT $K AS k, l_partkey % 10 AS ax, l_suppkey % 10 AS ay FROM lineitem)
      ORDER BY k""",

    "q_overlay_area" -> s"""
      SELECT k,
             CAST(greatest(0, least(a + 10, 15) - greatest(a, 5)) * 7 AS DOUBLE) AS inter_area,
             CAST(100 + 70 - greatest(0, least(a + 10, 15) - greatest(a, 5)) * 7 AS DOUBLE) AS union_area,
             CAST(100 - greatest(0, least(a + 10, 15) - greatest(a, 5)) * 7 AS DOUBLE) AS diff_area
      FROM (SELECT $K AS k, l_partkey % 12 AS a FROM lineitem)
      ORDER BY k""",

    "q_convexhull" -> s"""
      SELECT $K AS k,
             CAST(((l_partkey % 20) + 2) * ((l_suppkey % 20) + 2) AS DOUBLE) / 2 AS hull_area
      FROM lineitem ORDER BY k""",

    "q_makepolygon" -> s"""
      SELECT $K AS k,
             CAST(((l_partkey % 30) + 1) * ((l_suppkey % 30) + 1) AS DOUBLE) / 2 AS area,
             true AS valid
      FROM lineitem ORDER BY k""",

    "q_line_accessors" -> s"""
      SELECT $K AS k,
             'POINT (' || (l_partkey % 40) || ' ' || (l_suppkey % 40) || ')' AS sp,
             'POINT (0 0)' AS ep,
             'POINT (' || ((l_partkey % 40) + 3) || ' ' || ((l_suppkey % 40) + 4) || ')' AS p2,
             3 AS np,
             (l_partkey % 40) = 0 AND (l_suppkey % 40) = 0 AS closed,
             'LINESTRING' AS gtype,
             1 AS dim,
             false AS empt
      FROM lineitem ORDER BY k""",

    "q_envelope_ring" -> s"""
      SELECT $K AS k,
             'LINESTRING (0 0, 0 ' || ((l_suppkey % 40) + 1) || ', ' || ((l_partkey % 40) + 1) || ' '
               || ((l_suppkey % 40) + 1) || ', ' || ((l_partkey % 40) + 1) || ' 0, 0 0)' AS ring,
             0 AS nrings,
             0.0 AS xmin, 0.0 AS ymin,
             CAST((l_partkey % 40) + 1 AS DOUBLE) AS xmax, CAST((l_suppkey % 40) + 1 AS DOUBLE) AS ymax
      FROM lineitem ORDER BY k""",

    "q_extent_struct" -> s"""
      SELECT $K AS k,
             CAST(l_partkey % 7 AS DOUBLE) AS minx, CAST(l_suppkey % 7 AS DOUBLE) AS miny,
             CAST(l_partkey % 7 AS DOUBLE) + 2.0 AS maxx, CAST(l_suppkey % 7 AS DOUBLE) + 3.0 AS maxy
      FROM lineitem ORDER BY k""",

    "q_flip_multi_reverse" -> s"""
      SELECT $K AS k,
             'POINT (' || (l_suppkey % 30) || ' ' || (l_partkey % 30) || ')' AS flipped,
             'MULTIPOINT (' || (l_partkey % 30) || ' ' || (l_suppkey % 30) || ')' AS multi,
             'LINESTRING (0 ' || (l_suppkey % 30) || ', ' || (l_partkey % 30) || ' 0)' AS rev,
             1 AS ngeom
      FROM lineitem ORDER BY k""",

    "q_force_dims" -> s"""
      SELECT $K AS k,
             'POINT Z (' || (l_partkey % 30) || ' ' || (l_suppkey % 30) || ' ' || l_linenumber || ')' AS z3,
             'POINT (' || (l_partkey % 30) || ' ' || (l_suppkey % 30) || ')' AS back2d,
             true AS hz,
             2 AS zmf,
             CAST(l_partkey % 9 AS DOUBLE) AS zval
      FROM lineitem ORDER BY k""",

    "q_collect_array" -> s"""
      SELECT $K AS k,
             'MULTIPOINT (' || (l_partkey % 25) || ' 0, 0 ' || (l_suppkey % 25) || ')' AS mp
      FROM lineitem ORDER BY k""",

    "q_dump" -> s"""
      SELECT k, unnest(['POINT (' || (l_partkey % 35) || ' 0)', 'POINT (7 ' || (l_suppkey % 35) || ')']) AS part_wkt
      FROM (SELECT $K AS k, l_partkey, l_suppkey FROM lineitem)
      ORDER BY k, part_wkt""",

    "q_simplify_valid" -> s"""
      SELECT $K AS k,
             2 AS np_simpl,
             false AS bowtie_valid,
             2.0 AS fixed_area
      FROM lineitem ORDER BY k""",

    "q_buffer" -> s"""
      SELECT $K AS k, 33 AS np
      FROM lineitem ORDER BY k""",

    "q_accessors_zm" -> s"""
      SELECT $K AS k,
             CAST(l_linenumber AS DOUBLE) AS z,
             CAST(l_orderkey % 100 AS DOUBLE) AS m,
             CAST(l_linenumber AS DOUBLE) AS zmax,
             CAST(l_orderkey % 100 AS DOUBLE) AS mmin,
             true AS hm,
             3 AS zmf,
             'POINT (' || (l_partkey % 50) || ' ' || (l_suppkey % 50) || ')' AS t2d
      FROM lineitem ORDER BY k""",

    "q_shapes2" -> s"""
      SELECT k,
             a + 3.0 AS posx, b + 4.0 AS posy,
             4.0 AS gap,
             sqrt(208.0) AS maxd,
             'LINESTRING (' || (a + 10) || ' ' || b || ', ' || (a + 10) || ' ' || (b + 2) || ', '
               || (a + 12) || ' ' || (b + 2) || ', ' || (a + 12) || ' ' || b || ', '
               || (a + 10) || ' ' || b || ')' AS bound,
             'LINESTRING (0 0, ' || (a + 1) || ' 0, ' || (a + 1) || ' ' || (b + 1) || ')' AS merged
      FROM (SELECT $K AS k, l_partkey % 15 AS a, l_suppkey % 15 AS b FROM lineitem)
      ORDER BY k""",

    "q_predicates2" -> s"""
      SELECT k,
             NOT (x = 7 OR y = 7) AND NOT (x BETWEEN 1 AND 5 AND y BETWEEN 1 AND 5) AS tch,
             (x BETWEEN 1 AND 5 AND y BETWEEN 1 AND 5) AND NOT (x BETWEEN 2 AND 4 AND y BETWEEN 2 AND 4) AS ovl,
             x BETWEEN 2 AND 4 AND y BETWEEN 2 AND 4 AS cnt,
             x = 3 AND y = 3 AS cntp,
             x BETWEEN 2 AND 4 AND y BETWEEN 2 AND 4 AS cov,
             x BETWEEN 2 AND 4 AND y BETWEEN 2 AND 4 AS wth,
             false AS crs
      FROM (SELECT $K AS k, l_partkey % 8 AS x, l_suppkey % 8 AS y FROM lineitem)
      ORDER BY k""",

    "q_norm_reduce" -> s"""
      SELECT $K AS k,
             'MULTIPOINT (0 0, 5 5, ' || ((l_partkey % 20) + 10) || ' 0)' AS norm,
             'POINT (' || (l_partkey % 40) || ' ' || ((l_suppkey % 40) + 1) || ')' AS red,
             3 AS ndedup,
             'MULTIPOINT (0 0, 0 ' || ((l_suppkey % 30) + 1) || ', ' || ((l_partkey % 30) + 1) || ' '
               || ((l_suppkey % 30) + 1) || ', ' || ((l_partkey % 30) + 1) || ' 0, 0 0)' AS pts,
             true AS ring,
             false AS simp
      FROM lineitem ORDER BY k""",

    "q_svg" -> s"""
      SELECT $K AS k,
             'cx="' || (l_partkey % 30) || '" cy="' || (CASE WHEN l_suppkey % 30 = 0 THEN '0' ELSE '-' || (l_suppkey % 30) END) || '"' AS svg_pt,
             'x="' || (l_partkey % 30) || '" y="' || (CASE WHEN l_suppkey % 30 = 0 THEN '0' ELSE '-' || (l_suppkey % 30) END) || '"' AS svg_rel,
             'M 0 0 L 0 -' || ((l_suppkey % 30) + 1) || ' ' || ((l_partkey % 30) + 1) || ' -' || ((l_suppkey % 30) + 1)
               || ' ' || ((l_partkey % 30) + 1) || ' 0 0 0 Z' AS svg_poly
      FROM lineitem ORDER BY k""",

    "q_haversine" -> s"""
      SELECT $K AS k,
             round(2 * 6371000.0 * asin(sqrt(
               pow(sin((radians(CAST(l_partkey % 90 AS DOUBLE) - 45.0) - radians(CAST(l_partkey % 120 AS DOUBLE) - 60.0)) / 2), 2)
               + cos(radians(CAST(l_partkey % 120 AS DOUBLE) - 60.0)) * cos(radians(CAST(l_partkey % 90 AS DOUBLE) - 45.0))
                 * pow(sin((radians(CAST(l_suppkey % 90 AS DOUBLE) - 45.0) - radians(CAST(l_suppkey % 120 AS DOUBLE) - 60.0)) / 2), 2))), 3) AS hav_m
      FROM lineitem ORDER BY k""",

    "q_transform" -> s"""
      SELECT k,
             round(radians(lon) * 6378137.0, 4) AS mx,
             round(6378137.0 * ln(tan(pi() / 4 + radians(lat) / 2)), 4) AS my
      FROM (SELECT $K AS k, CAST(l_partkey % 300 AS DOUBLE) - 150.0 AS lon, CAST(l_suppkey % 160 AS DOUBLE) - 80.0 AS lat
            FROM lineitem)
      ORDER BY k""",

    "q_extent_agg" -> """
      SELECT l_returnflag AS flag,
             CAST(min(l_partkey) AS DOUBLE) AS xmin, CAST(max(l_partkey) AS DOUBLE) AS xmax,
             CAST(min(l_suppkey) AS DOUBLE) AS ymin, CAST(max(l_suppkey) AS DOUBLE) AS ymax
      FROM lineitem GROUP BY l_returnflag ORDER BY flag""",

    "q_union_agg" -> """
      SELECT l_returnflag AS flag,
             CAST(25 * count(DISTINCT l_partkey % 100) AS DOUBLE) AS area
      FROM lineitem GROUP BY l_returnflag ORDER BY flag""",

    "q_intersection_agg" -> """
      SELECT l_returnflag AS flag,
             CAST((100 + min(l_partkey % 10)) * (100 + min(l_suppkey % 10)) AS DOUBLE) AS area
      FROM lineitem GROUP BY l_returnflag ORDER BY flag""",

    "q_collect_agg" -> """
      SELECT l_returnflag AS flag, CAST(count(*) AS INT) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY flag""",

    "q_spatial_join" -> """
      SELECT p.k, e.cell
      FROM (SELECT l_orderkey * 10 + l_linenumber AS k,
                   l_partkey % 100 AS px, l_suppkey % 100 AS py
            FROM lineitem WHERE l_orderkey % 37 = 0) p
      JOIN (SELECT s_suppkey AS cell,
                   (s_suppkey % 10) * 10 AS ex, ((s_suppkey // 10) % 10) * 10 AS ey
            FROM supplier) e
      ON p.px > e.ex AND p.px < e.ex + 10 AND p.py > e.ey AND p.py < e.ey + 10
      ORDER BY p.k, e.cell""",

    "q_sessionize" -> """
      SELECT user_id,
             CAST(sum(new_sess) AS INT) AS sessions,
             CAST(count(*) AS INT) AS events
      FROM (SELECT user_id,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                          OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                        THEN 1 ELSE 0 END AS new_sess
            FROM events)
      GROUP BY user_id ORDER BY user_id""",

    "q_event_stats" -> """
      SELECT event_type, CAST(count(*) AS INT) AS n, min(value) AS vmin, max(value) AS vmax
      FROM events GROUP BY event_type ORDER BY event_type""",

    "q_dedup_exact" -> """
      SELECT doc_id, CAST(cnt AS INT) AS group_size
      FROM (SELECT doc_id,
                   row_number() OVER (PARTITION BY norm ORDER BY doc_id) AS rn,
                   count(*) OVER (PARTITION BY norm) AS cnt
            FROM (SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm FROM documents))
      WHERE rn = 1 ORDER BY doc_id""",

    "q_ngram_jaccard" -> """
      WITH w AS (SELECT doc_id, text, regexp_split_to_array(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS ws
                 FROM documents),
      g AS (SELECT doc_id,
                   CASE WHEN length(ws) < 2 THEN [array_to_string(ws, ' ')]
                        ELSE list_distinct([ws[i] || ' ' || ws[i + 1] for i in range(1, length(ws))]) END AS gs
            FROM w)
      SELECT a.doc_id AS da, b.doc_id AS db,
             CAST(length(list_intersect(a.gs, b.gs)) AS DOUBLE)
               / (length(a.gs) + length(b.gs) - length(list_intersect(a.gs, b.gs))) AS j
      FROM g a JOIN g b ON b.doc_id = a.doc_id + 1
      ORDER BY da""",

    "q_token_stats" -> """
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN 0 ELSE CAST(length(regexp_split_to_array(trim(text), '\s+')) AS INT) END AS toks,
             CAST(length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS bpe_toks,
             CAST(length(text) AS INT) AS chars
      FROM documents ORDER BY doc_id""",

    "q_quality" -> """
      SELECT doc_id,
             CASE WHEN length(text) = 0 THEN 0.0 ELSE
               CAST(length(text) - length(regexp_replace(text, '[.,!?;:''"()\-]', '', 'g')) AS DOUBLE) / length(text) END AS punct,
             CASE WHEN length(text) = 0 THEN 0.0 ELSE
               CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) / length(text) END AS digits,
             CASE WHEN length(text) = 0 THEN 0.0 ELSE
               CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS DOUBLE) / length(text) END AS uppers,
             CASE WHEN trim(text) = '' THEN 0.0 ELSE
               CAST(length(regexp_replace(trim(text), '\s', '', 'g')) AS DOUBLE)
                 / length(regexp_split_to_array(trim(text), '\s+')) END AS mtl,
             CASE WHEN trim(text) = '' THEN 0.0 ELSE
               CAST(length(list_filter(regexp_split_to_array(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '),
                 x -> list_contains(['the','and','of','to','in','is','it','that','was','for','on','with','as','are','at','be','this','have','from','or','by','not','but'], x))) AS DOUBLE)
                 / length(regexp_split_to_array(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) END AS stops
      FROM documents ORDER BY doc_id""",

    "q_ann_bruteforce" -> """
      SELECT qid, nid
      FROM (SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
            FROM (SELECT q.vec_id AS qid, e.vec_id AS nid,
                         list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))
                           / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
                              * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))) AS sim
                  FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
                  CROSS JOIN embeddings e
                  WHERE e.vec_id != q.vec_id))
      WHERE rn <= 3 ORDER BY qid, nid""",

    // the pinned count from /root/reference/benchmark/rtree_points_noindex.benchmark
    "q_generatepoints_pin" -> "SELECT CAST(3986 AS INT) AS n",

    // same pin through the clustered/pruned path (rtree_points_index.benchmark)
    "q_rtree_clustered_pin" -> "SELECT CAST(3986 AS INT) AS n",

    "q_multimodal" -> """
      SELECT doc_id,
             CAST((strlen(text) % 640) + 1 AS INT) AS width,
             CAST(((strlen(text) * 7) % 480) + 1 AS INT) AS height,
             CAST(strlen(text) AS BIGINT) AS nbytes,
             'fake/rgb8' AS fmt
      FROM documents ORDER BY doc_id"""
  )
}
