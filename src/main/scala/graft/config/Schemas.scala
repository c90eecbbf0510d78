package graft.config

import graft.gen.Rng
import graft.model._

/** The two schemas shipped by the reference, rebuilt on the Scala ADT.
  * Enum vocabularies come from the bit-exact Mulberry32 port, so dictionary
  * contents match the reference byte-for-byte. */
object Schemas {

  private def ts: TimestampSpec = TimestampSpec("2024-01-01", "2025-01-01")
  private def enum5x1 = EnumSpec(EnumBase.Str, Rng.generateRandomStrings(5, 1))
  private def enum8x1 = EnumSpec(EnumBase.Str, Rng.generateRandomStrings(8, 1))
  private def enum3x1 = EnumSpec(EnumBase.Str, Rng.generateRandomStrings(3, 1))
  private def enum500x8 = EnumSpec(EnumBase.Str, Rng.generateRandomStrings(500, 8))

  /** Active 90-column "wide events" schema (reference:
    * src/config/tableConfig.ts:16-192): id + row_1..row_89 mixing timestamps,
    * fixed-length strings, nullable ints, and seeded string enums.
    * Partitioning `date(created_at)` is declared but disabled in the
    * reference's DDL emission (tableConfig.ts:10, sqlHelpers.ts:127) — we
    * reproduce the declaration and likewise leave it off by default. */
  val wideEvents: TableConfig = {
    val strLens = Map(
      3 -> 7, 4 -> 7, 5 -> 1, 6 -> 3, 7 -> 1, 8 -> 4, 29 -> 8, 30 -> 8, 31 -> 13,
      32 -> 35, 33 -> 1, 34 -> 2, 35 -> 1, 36 -> 5, 38 -> 14, 39 -> 10, 40 -> 14,
      41 -> 7, 47 -> 8, 49 -> 2, 50 -> 1, 51 -> 2, 52 -> 1, 53 -> 1, 55 -> 2,
      56 -> 3, 57 -> 5, 58 -> 5, 59 -> 2, 64 -> 3, 65 -> 2, 66 -> 7, 68 -> 12,
      69 -> 12, 70 -> 12, 71 -> 12, 73 -> 32, 74 -> 32, 75 -> 8, 76 -> 8,
      77 -> 4, 78 -> 1, 79 -> 1, 80 -> 1, 81 -> 1, 82 -> 1, 83 -> 10, 84 -> 16,
      85 -> 14, 86 -> 10, 87 -> 1, 88 -> 5, 89 -> 4
    )
    val intRanges = Map( // row_9..row_27 (tableConfig.ts:36-54)
      9 -> (1000L, 10000L, 0.05), 10 -> (1000L, 2500L, 0.03), 11 -> (100L, 250L, 0.03),
      12 -> (1000L, 3000L, 0.03), 13 -> (100L, 300L, 0.03), 14 -> (100L, 5000L, 0.03),
      15 -> (10L, 500L, 0.03), 16 -> (30L, 100L, 0.03), 17 -> (3L, 10L, 0.03),
      18 -> (1L, 5L, 0.03), 19 -> (1000L, 2500L, 0.03), 20 -> (100L, 250L, 0.03),
      21 -> (1000L, 3000L, 0.03), 22 -> (100L, 300L, 0.03), 23 -> (100L, 5000L, 0.03),
      24 -> (10L, 500L, 0.03), 25 -> (30L, 100L, 0.03), 26 -> (3L, 10L, 0.03),
      27 -> (1L, 5L, 0.03)
    )
    val tsCols = Set(1, 2, 37, 42, 43, 44, 45, 46, 60)
    val enums = Map(
      28 -> enum5x1, 48 -> enum8x1, 54 -> enum8x1, 61 -> enum500x8,
      62 -> enum500x8, 63 -> enum500x8, 67 -> enum3x1, 72 -> enum3x1
    )
    val cols: Seq[(String, FieldSpec)] =
      ("id" -> BigintSpec(1, 1)) +: (1 to 89).map { i =>
        val spec: FieldSpec =
          if (tsCols(i)) ts
          else if (intRanges.contains(i)) {
            val (mn, mx, p) = intRanges(i); IntSpec(mn, mx, p)
          } else if (enums.contains(i)) enums(i)
          else StringSpec(strLens(i))
        s"row_$i" -> spec
      }
    TableConfig(
      catalog = "spark_catalog",
      schema = "lab",
      tableBase = "events",
      format = "PARQUET",
      partitioning = Seq("date(created_at)"),
      columns = cols,
      idColumn = Some("id")
    )
  }

  /** Narrow "orders" schema (reference: src/config/tableConfig.ts:193-203) —
    * the only schema exercising double, nullable enum, and array specs. */
  val narrowOrders: TableConfig = TableConfig(
    catalog = "spark_catalog",
    schema = "lab",
    tableBase = "orders_narrow",
    columns = Seq(
      "id" -> BigintSpec(1, 1),
      "user_name" -> StringSpec(16),
      "amount" -> DoubleSpec(0, 10000, 0.05),
      "created_at" -> ts,
      "status" -> EnumSpec(EnumBase.Str, Seq("new", "paid", "delivered", "canceled")),
      "country" -> EnumSpec(EnumBase.Str, Seq("KZ", "US", "DE", "TR", "PL"), 0.02),
      "age" -> IntSpec(18, 78, 0.03),
      "note" -> StringSpec(8, 0.1),
      "tags" -> ArraySpec(
        EnumSpec(EnumBase.Str, Seq("alpha", "beta", "gamma", "delta")),
        minLen = 1, maxLen = 3, nullable = 0.1
      )
    ),
    idColumn = Some("id")
  )
}
