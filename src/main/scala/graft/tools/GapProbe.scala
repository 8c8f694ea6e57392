package graft.tools

import org.apache.spark.sql.SparkSession

object GapProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[2]").config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s.sql("CREATE OR REPLACE TEMP VIEW a AS SELECT * FROM VALUES (1,10),(2,20) t(k,v)")
    s.sql("CREATE OR REPLACE TEMP VIEW b AS SELECT * FROM VALUES (2) t(k)")
    def t(label: String, q: String): Unit =
      try println(s"$label: OK " + s.sql(graft.component.Dialect.rewrite(q)).collect().mkString(","))
      catch { case e: Exception => println(s"$label: ERR " + e.getMessage.replaceAll("\n"," ").take(100)) }
    t("semi", "SELECT * FROM a SEMI JOIN b USING(k)")
    t("anti", "SELECT * FROM a ANTI JOIN b USING(k)")
  }
}
