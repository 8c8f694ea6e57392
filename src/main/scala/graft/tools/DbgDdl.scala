package graft.tools
import org.apache.spark.sql.SparkSession
object DbgDdl {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[2]").config("spark.ui.enabled","false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.component.DuckFunctions.register(s)
    val ex = new graft.component.Executor(s, java.nio.file.Files.createTempDirectory("graft_dbg_").toString)
    try ex.runStatement(graft.component.Dialect.rewrite(
      "CREATE TABLE dt (a INT DEFAULT 5, b INT NOT NULL, c INT CHECK (c > 0))"))
    catch { case e: Exception => println("FULL ERR: " + e.getMessage.take(600)) }
  }
}
