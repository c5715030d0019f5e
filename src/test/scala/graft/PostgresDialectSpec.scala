package graft

import scala.sys.process._

import graft.streaming.JdbcUpsertSink

/** EXECUTES the `postgres` dialect of [[JdbcUpsertSink]] — not just its
  * SQL string. No Postgres exists in the sandbox, but DuckDB speaks the
  * identical `INSERT ... ON CONFLICT (key) DO NOTHING` syntax
  * (the reference's exact statement, webhook_app.py:48), so the
  * statement text the sink would prepare against Postgres is run
  * verbatim through DuckDB with qmark parameters: once, again with the
  * same key (the conflict leg — must keep the FIRST row's values, the
  * DO-NOTHING-not-DO-UPDATE distinction), and once with a new key.
  * Derby's MERGE twin runs live in JdbcUpsertLiveSpec; this closes the
  * other dialect branch.
  *
  * The runner is the sandbox's python3+duckdb (also what the driver's
  * oracle uses); the suite CANCELS rather than fails where that pair is
  * absent, so `sbt test` stays self-contained off this box.
  */
class PostgresDialectSpec extends SparkSpec {

  private def duckdbAvailable: Boolean =
    try Process(Seq("python3", "-c", "import duckdb")).! == 0
    catch { case _: Throwable => false }

  test("postgres ON CONFLICT DO NOTHING statement executes with first-wins semantics") {
    assume(duckdbAvailable, "python3+duckdb not on this box")
    val sink = new JdbcUpsertSink("jdbc:unused", "leads", "id", dialect = "postgres")
    val sql = sink.upsertSql(Seq("id", "title", "status"))
    assert(sql == "INSERT INTO leads (id, title, status) VALUES (?, ?, ?) " +
      "ON CONFLICT (id) DO NOTHING")
    // param order must be the bare column list for this dialect (the
    // derby dialect prepends the key probe; postgres must NOT)
    assert(sink.paramCols(Seq("id", "title", "status")) == Seq("id", "title", "status"))
    val script =
      s"""import duckdb
         |con = duckdb.connect()
         |con.execute("CREATE TABLE leads (id BIGINT PRIMARY KEY, title VARCHAR, status VARCHAR)")
         |sql = '''$sql'''
         |con.execute(sql, [1, 'first', 'new'])
         |con.execute(sql, [1, 'second', 'won'])  # replayed key: must be a no-op
         |con.execute(sql, [2, 'other', 'new'])
         |rows = con.execute("SELECT id, title, status FROM leads ORDER BY id").fetchall()
         |assert rows == [(1, 'first', 'new'), (2, 'other', 'new')], rows
         |print("CONFORMS")
         |""".stripMargin
    val out = Process(Seq("python3", "-c", script)).!!.trim
    assert(out == "CONFORMS")
  }
}
