#!/usr/bin/env python3
"""Generate the GeoPackage test fixture (src/test/resources/fixture.gpkg)
with Python's stdlib sqlite3 — a minimal OGC-conformant file: gpkg_contents,
gpkg_geometry_columns, and one feature table with GPKG geometry blobs."""
import os, sqlite3, struct, sys

out = sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/fixture.gpkg"
os.makedirs(os.path.dirname(out), exist_ok=True)
if os.path.exists(out):
    os.remove(out)

con = sqlite3.connect(out)
con.execute("PRAGMA application_id = 0x47504B47")  # 'GPKG'
con.execute("PRAGMA user_version = 10300")
con.execute("""CREATE TABLE gpkg_contents (
  table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,
  identifier TEXT, description TEXT, last_change TEXT,
  min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)""")
con.execute("""CREATE TABLE gpkg_geometry_columns (
  table_name TEXT NOT NULL, column_name TEXT NOT NULL,
  geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
  z TINYINT NOT NULL, m TINYINT NOT NULL)""")
con.execute("""CREATE TABLE cities (
  fid INTEGER PRIMARY KEY, name TEXT, population INTEGER,
  score DOUBLE, geom BLOB)""")
con.execute("INSERT INTO gpkg_contents VALUES ('cities','features','cities',NULL,NULL,0,0,50,50,4326)")
con.execute("INSERT INTO gpkg_geometry_columns VALUES ('cities','geom','POINT',4326,0,0)")

def gpkg_point(x, y):
    # GP blob: magic, version 0, flags 0x01 (LE, no envelope), srs_id, then WKB
    header = b"GP" + bytes([0, 0x01]) + struct.pack("<i", 4326)
    wkb = struct.pack("<BIdd", 1, 1, x, y)
    return header + wkb

rows = [(1, "alpha", 1000, 1.5, gpkg_point(1.0, 2.0)),
        (2, "beta", 25000, -0.25, gpkg_point(30.0, 40.0)),
        (3, "gamma", 7, 9.0, gpkg_point(-5.5, 6.25))]
con.executemany("INSERT INTO cities VALUES (?,?,?,?,?)", rows)
con.commit()
con.close()
print(f"wrote {out} ({os.path.getsize(out)} bytes)")
