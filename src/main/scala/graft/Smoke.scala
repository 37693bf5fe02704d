package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Entry + library smoke runner: drives the flagship pipeline and the
  * NFT derivation / custom-expression surface end-to-end. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val e = SparkEntry.entry(spark)
    println(s"ENTRY ROWS=${e.count()}")
    e.show(5, false)

    // library surface: log decode -> entities, SQL-registered expressions
    graft.expr.Exprs.register(spark)
    graft.expr.Abi.register(spark)
    println(spark.sql(
      "SELECT keccak256('Transfer(address,address,uint256)') AS sig, " +
      "hex_add('0xff', '0x01') AS s, hex_cmp('0x02', '0x10') AS c").head())
    val logs = Seq(
      (false, 0L, 0L, "0x" + "ab" * 32, "0x" + "cd" * 32, 100L,
        "0xc0ffee0000000000000000000000000000000001", "0x",
        Seq(graft.nft.Derive.Erc721TransferSig,
          "0x" + "0" * 64,
          "0x" + "0" * 24 + "aaaa000000000000000000000000000000000001",
          "0x" + "0" * 63 + "7"))
    ).toDF("removed", "log_index", "transaction_index", "transaction_hash",
      "block_hash", "block_number", "address", "data", "topics")
    val t = graft.nft.Derive.transfers(logs)
    println(s"DERIVED TRANSFERS=${t.count()}")
    t.show(false)
    spark.stop()
  }
}
