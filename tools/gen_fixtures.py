#!/usr/bin/env python3
"""Generate the diag_mini test fixture tree (FIXTURES.md §A) under
src/test/resources/diag_mini. Deterministic; run once and commit the
output. Builder-side dev tool (python is driver-side only)."""
import os
import zipfile

ROOT = os.path.join(os.path.dirname(__file__), "..",
                    "src/test/resources/diag_mini")

STATUS = """Datacenter: dc1
=======================
Status=Up/Down
|/ State=Normal/Leaving/Joining/Moving
--  Address   Load       Tokens  Owns    Host ID                               Rack
UN  10.0.0.1  100.5 GiB  256     50.0%   11111111-1111-1111-1111-111111111111  rack1
UN  10.0.0.2  120.3 GiB  256     50.0%   22222222-2222-2222-2222-222222222222  rack1
Datacenter: dc2
=======================
Status=Up/Down
|/ State=Normal/Leaving/Joining/Moving
--  Address   Load       Tokens  Owns    Host ID                               Rack
UN  10.0.0.3  80.1 GiB   256     50.0%   33333333-3333-3333-3333-333333333333  rack2
UN  10.0.0.4  90.0 GiB   256     50.0%   44444444-4444-4444-4444-444444444444  rack2
DN  10.0.0.9  10.0 GiB   256     0.0%    99999999-9999-9999-9999-999999999999  rack2
"""

GOSSIP = """/10.0.0.1
  generation:1677000000
  heartbeat:12345
  STATUS:14:NORMAL,-1000
  DC:8:dc1
  RACK:10:rack1
  RELEASE_VERSION:4:4.0.11
/10.0.0.2
  generation:1677000001
  heartbeat:12346
  DC:dc1
  RACK:10:rack1
  RELEASE_VERSION:4:4.0.11
/10.0.0.3
  generation:1677000002
  heartbeat:12347
  DC:8:dc2
  RACK:10:rack2
  X_11_PADDING:36:{"workload":"Cassandra","graph":false,"dse_version":"6.0.0"}
/10.0.0.4
  generation:1677000003
  heartbeat:12348
  DC:8:dc2
  RACK:10:rack2
  DSE_GOSSIP_STATE:42:{"workload":"Search","graph":"true","dse_version":"6.8.25"}
"""

DESCRIBECLUSTER = """Cluster Information:
\tName: TestCluster
\tSnitch: org.apache.cassandra.locator.GossipingPropertyFileSnitch
\tPartitioner: org.apache.cassandra.dht.Murmur3Partitioner
"""

VERSION = "ReleaseVersion: 4.0.11\n"


def info(uptime, dc):
    return (f"ID                     : aaa\nGossip active          : true\n"
            f"Uptime (seconds)       : {uptime}\n"
            f"Heap Memory (MB)       : 1024.00 / 2048.00\n"
            f"Data Center            : {dc}\nRack                   : rack1\n")


CFSTATS = """Total number of tables: 160
----------------
Keyspace : ks1
\tRead Count: 14400
\tWrite Count: 15000
\tTable: users
\t\tSSTable count: 25
\t\tSpace used (live): 2000000000
\t\tLocal read count: 12000
\t\tLocal write count: 6000
\t\tLocal read latency: 150.5 ms
\t\tLocal write latency: 0.5 ms
\t\tCompacted partition maximum bytes: 260000000
\t\tDropped Mutations: 200000

\tTable: orders
\t\tSSTable count: 5
\t\tSpace used (live): 1000000000
\t\tLocal read count: 2400
\t\tLocal write count: 9000
\t\tLocal read latency: 3.2 ms
\t\tLocal write latency: 1.1 ms
\t\tCompacted partition maximum bytes: 150000000
\t\tDropped Mutations: 0

	Table: idle
		Local read latency: NaN ms
		Local write latency: NaN ms

----------------
Keyspace : system
\tTable: local
\t\tSSTable count: 2
\t\tSpace used (live): 12345
\t\tLocal read count: 100
\t\tLocal write count: 100

----------------
Keyspace : ks2
\tTable (index): users_by_email_idx
\t\tSpace used (live): 500
\t\tLocal read count: 10

\tColumn Family: legacy_cf
\t\tSSTable count: 3
\t\tSpace used (live): 300000000
\t\tLocal read count: 60
\t\tLocal write count: 72
\t\tLocal read latency: 1.0 ms
\t\tLocal write latency: 2.0 ms
"""

wide_cols = "\n".join(f"    col{i:02d} text," for i in range(50))
SCHEMA = f"""CREATE KEYSPACE ks1 WITH replication = {{'class': 'NetworkTopologyStrategy', 'dc1': '3', 'dc2': '2'}}  AND durable_writes = true;

CREATE KEYSPACE ks2 WITH replication = {{'class': 'SimpleStrategy', 'replication_factor': '3'}};

CREATE TABLE ks1.users (
    user_id uuid,
    email text,
    name text,
    created timestamp,
    PRIMARY KEY (user_id, created)
) WITH CLUSTERING ORDER BY (created ASC)
    AND bloom_filter_fp_chance = 0.01;

CREATE TABLE ks1.orders (
    order_id uuid,
    user_id uuid,
    amount decimal,
    PRIMARY KEY ((order_id, user_id), amount)
);

CREATE TABLE ks2."legacy_cf" (
    id uuid PRIMARY KEY,
{wide_cols}
    last text
);

CREATE TYPE ks1.address (
    street text,
    city text
);

CREATE INDEX users_name_idx ON ks1.users (name);

CREATE INDEX users_created_idx ON ks1.users (created);

CREATE CUSTOM INDEX users_email_sai ON ks1.users (email) USING 'StorageAttachedIndex';

CREATE MATERIALIZED VIEW ks1.users_by_email AS
    SELECT * FROM ks1.users
    WHERE email IS NOT NULL
    PRIMARY KEY (email, user_id);

CREATE MATERIALIZED VIEW ks1.users_by_name AS
    SELECT * FROM ks1.users
    WHERE name IS NOT NULL
    PRIMARY KEY (name, user_id);

CREATE MATERIALIZED VIEW ks1.users_by_created AS
    SELECT * FROM ks1.users
    WHERE created IS NOT NULL
    PRIMARY KEY (created, user_id);

CREATE FUNCTION ks1.avgstate(state tuple<int,bigint>, val int) CALLED ON NULL INPUT RETURNS tuple<int,bigint> LANGUAGE java AS 'return state;';

CREATE OR REPLACE FUNCTION ks1.maxof(a int, b int) RETURNS NULL ON NULL INPUT RETURNS int LANGUAGE java AS 'return Math.max(a,b);';

CREATE AGGREGATE IF NOT EXISTS ks1.average(int) SFUNC avgstate STYPE tuple<int,bigint> FINALFUNC avgfinal INITCOND (0, 0);
"""

SYSLOG_1 = """INFO  [Service Thread] 2023-03-01 10:00:00,123 GCInspector.java:284 - ParNew GC in 210ms.  CMS Old Gen: 100 -> 200
INFO  [ScheduledTasks:1] 2023-03-01 11:00:00,456 GCInspector.java:284 - ParNew GC in 450ms.  CMS Old Gen: 100 -> 200
WARN  [ReadStage-2] 2023-03-01 11:30:00,789 ReadCommand.java:576 - Read 10 live rows and 2000 tombstone cells for query SELECT * FROM ks1.users WHERE token(user_id) >= token(123) LIMIT 100 (see tombstone_warn_threshold)
WARN  [ReadStage-3] 2023-03-01 12:00:00,111 ReadCommand.java:576 - Read 55 live and 5000 tombstone cells in ks2.legacy_cf for key: abc
WARN  [ReadStage-4] 2023-03-01 12:30:00,222 ReadCommand.java:576 - Read 99 live rows and 500 tombstone cells for query SELECT * FROM ks1.orders LIMIT 10
INFO  [main] 2023-03-01 13:00:00,000 StorageService.java:100 - unrelated line with colon: value
"""

SYSLOG_1_ZIPPED = """INFO  [Service Thread] 2023-02-28 09:00:00,123 GCInspector.java:284 - ParNew GC in 300ms.  CMS Old Gen: 1 -> 2
INFO  [Service Thread] 2023-02-28 09:30:00,456 GCInspector.java:284 - ParNew GC in 600ms.  CMS Old Gen: 1 -> 2
"""

SYSLOG_1_ADDL = """INFO  [Service Thread] 2023-03-02 08:00:00,123 GCInspector.java:284 - ParNew GC in 1000ms.  CMS Old Gen: 1 -> 2
"""

SYSLOG_2 = """INFO  [Service Thread] 2023-03-01 10:15:00,123 GCInspector.java:284 - ParNew GC in 100ms.  CMS Old Gen: 100 -> 200
"""

PROXYHIST = """proxy histograms
Percentile       Read Latency      Write Latency     Range Latency
                     (micros)           (micros)          (micros)
50%                    1310.72            654.95           263.21
75%                    1955.67            785.94           315.85
95%                    4055.27           1131.75           379.02
98%                    4866.32           1358.10           454.83
99%                    5839.59           1629.72           545.79
Min                      88.15             29.52            51.01
Max                   25109.16          17436.92          1358.10
"""

NODES = {
    "10_0_0_1": {"ip": "10.0.0.1", "uptime": 86400, "dc": "dc1"},
    "10.0.0.2": {"ip": "10.0.0.2", "uptime": 86400, "dc": "dc1"},
    "10.0.0.3": {"ip": "10.0.0.3", "uptime": 43200, "dc": "dc2"},
    "10.0.0.4": {"ip": "10.0.0.4", "uptime": 43200, "dc": "dc2"},
}


def w(path, content):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(content)


for nd, meta in NODES.items():
    base = os.path.join(ROOT, "nodes", nd)
    w(f"{base}/nodetool/status", STATUS)
    w(f"{base}/nodetool/gossipinfo", GOSSIP)
    w(f"{base}/nodetool/describecluster", DESCRIBECLUSTER)
    w(f"{base}/nodetool/version", VERSION)
    w(f"{base}/nodetool/info", info(meta["uptime"], meta["dc"]))
    if nd == "10.0.0.3":  # exercise the tablestats fallback
        w(f"{base}/nodetool/tablestats", CFSTATS)
    else:
        w(f"{base}/nodetool/cfstats", CFSTATS)
    w(f"{base}/nodetool/proxyhistograms", PROXYHIST)

w(os.path.join(ROOT, "nodes/10_0_0_1/driver/schema"), SCHEMA)
w(os.path.join(ROOT, "nodes/10_0_0_1/logs/cassandra/system.log"), SYSLOG_1)
w(os.path.join(ROOT, "nodes/10.0.0.2/logs/cassandra/system.log"), SYSLOG_2)

zpath = os.path.join(ROOT, "nodes/10_0_0_1/logs/cassandra/system.log.1.zip")
os.makedirs(os.path.dirname(zpath), exist_ok=True)
with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
    zi = zipfile.ZipInfo("system.log.1", date_time=(2023, 3, 1, 0, 0, 0))
    z.writestr(zi, SYSLOG_1_ZIPPED)

w(os.path.join(ROOT, "AdditionalLogs/10_0_0_1/var/log/cassandra/system.log"),
  SYSLOG_1_ADDL)

print("fixture tree written to", ROOT)
