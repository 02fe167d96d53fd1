package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-7 continuation: training-data pipeline operators beyond the q2xx
  * catalog — repetition-aware mixture allocation and scan-time PII
  * validation. Same oracle discipline as TextQueries: exact integer/decimal
  * arithmetic end-to-end, column names/types aligned with the DuckDB SQL.
  */
object TrainQueries {

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------- q251
    // DATA-CONSTRAINED EPOCH MIXING (Muennighoff et al. '23, 2305.16264;
    // the LLaMA-style mixture table with per-source epoch caps): the token
    // budget B exceeds the corpus (2×), each source's declared mixture
    // weight earns it a share, and no source may repeat more than 3 epochs
    // — the up-sampling complement to q204's down-sampling apportionment.
    // Water-filling in EXACT integer arithmetic: largest-remainder share by
    // weight, clamp at the 3-epoch cap, then redistribute the clamped
    // overflow among uncapped sources proportionally to their REMAINING
    // HEADROOM (one round provably suffices: add ≤ headroom because
    // leftover < total headroom whenever B < 3·T, and floor(L·h/H) ≤ h−1
    // strictly). Scale shape: the corpus is touched by ONE aggregate; the
    // apportionment runs over #sources rows (a broadcast-sized table), the
    // only windows are over those k rows — at 100 TB with thousands of
    // sources this is still driver-free and O(k log k).
    Q("q251_epoch_mixing",
      """WITH s AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS chars
        |           FROM documents GROUP BY 1),
        |w AS (SELECT source, chars,
        |  CAST(regexp_extract(source, '([0-9]+)$', 1) AS BIGINT) % 7 + 1 AS wt
        |  FROM s),
        |t AS (SELECT CAST(sum(chars) AS BIGINT) * 2 AS b,
        |  CAST(sum(wt) AS BIGINT) AS tw FROM w),
        |a0 AS (SELECT source, chars, wt, b, (b * wt) // tw AS base,
        |  (b * wt) % tw AS rem FROM w CROSS JOIN t),
        |k1 AS (SELECT max(b) - sum(base) AS k1 FROM a0),
        |sh AS (SELECT source, chars, wt, b,
        |  base + CASE WHEN row_number() OVER (ORDER BY rem DESC, source) <= k1
        |              THEN 1 ELSE 0 END AS share,
        |  chars * 3 AS cap
        |  FROM a0 CROSS JOIN k1),
        |c1 AS (SELECT source, chars, wt, b, share, cap,
        |  least(share, cap) AS alloc1, share > cap AS capped,
        |  cap - least(share, cap) AS h FROM sh),
        |l AS (SELECT max(b) - sum(alloc1) AS l, sum(h) AS hh FROM c1),
        |r2 AS (SELECT c1.*, (l * h) // hh AS base2, (l * h) % hh AS rem2, l
        |  FROM c1 CROSS JOIN l),
        |k2 AS (SELECT max(l) - sum(base2) AS k2 FROM r2),
        |f AS (SELECT source, chars, wt, capped,
        |  alloc1 + base2 + CASE WHEN h > 0 AND row_number() OVER
        |      (ORDER BY (h > 0) DESC, rem2 DESC, source) <= k2
        |    THEN 1 ELSE 0 END AS alloc
        |  FROM r2 CROSS JOIN k2)
        |SELECT source, chars, CAST(wt AS BIGINT) AS weight,
        |  CAST(alloc AS BIGINT) AS alloc_chars,
        |  CAST(alloc * 1000 // chars AS BIGINT) AS epochs_milli, capped
        |FROM f""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .select(col("source"), col("n_chars"))
      val bySrc = docs.groupBy(col("source"))
        .agg(sum(col("n_chars")).cast("long").as("chars"))
        .withColumn("wt",
          regexp_extract(col("source"), "([0-9]+)$", 1).cast("long") % 7 + 1L)
      val tot = bySrc.agg((sum(col("chars")) * 2).cast("long").as("b"),
        sum(col("wt")).cast("long").as("tw"))
      val a0 = bySrc.crossJoin(broadcast(tot))
        .withColumn("base", expr("(b * wt) div tw"))
        .withColumn("rem", expr("(b * wt) % tw"))
      val k1 = a0.agg((max(col("b")) - sum(col("base"))).cast("long").as("k1"))
      val sh = a0.crossJoin(broadcast(k1))
        .withColumn("share", col("base") + when(
          row_number().over(Window.orderBy(col("rem").desc, col("source").asc))
            <= col("k1"), 1L).otherwise(0L))
        .withColumn("cap", col("chars") * 3)
        .withColumn("alloc1", least(col("share"), col("cap")))
        .withColumn("capped", col("share") > col("cap"))
        .withColumn("h", col("cap") - col("alloc1"))
      val l = sh.agg((max(col("b")) - sum(col("alloc1"))).cast("long").as("l"),
        sum(col("h")).cast("long").as("hh"))
      val r2 = sh.crossJoin(broadcast(l))
        .withColumn("base2", expr("(l * h) div hh"))
        .withColumn("rem2", expr("(l * h) % hh"))
      val k2 = r2.agg((max(col("l")) - sum(col("base2"))).cast("long").as("k2"))
      val out = r2.crossJoin(broadcast(k2))
        .withColumn("alloc", col("alloc1") + col("base2") + when(
          col("h") > 0 && row_number().over(Window.orderBy(
            (col("h") > 0).desc, col("rem2").desc, col("source").asc))
            <= col("k2"), 1L).otherwise(0L))
        .select(col("source"), col("chars"), col("wt").as("weight"),
          col("alloc").as("alloc_chars"),
          expr("CAST(alloc * 1000 div chars AS BIGINT)").as("epochs_milli"),
          col("capped"))
        .localCheckpoint() // k rows; read by the invariants and the dump
      // water-filling invariants: exact budget, caps never exceeded, a
      // capped source sits at exactly 3.000 epochs
      val b = tot.head().getLong(0)
      require(out.agg(sum(col("alloc_chars"))).head().getLong(0) == b,
        "q251: allocations must sum to the budget exactly")
      require(out.filter(col("alloc_chars") > col("chars") * 3).isEmpty,
        "q251: an allocation exceeded the 3-epoch cap")
      require(out.filter(col("capped") && col("epochs_milli") =!= 3000L).isEmpty,
        "q251: a capped source must sit at exactly 3.000 epochs")
      out
    },

    // ---------------------------------------------------------------- q252
    // SCAN-TIME PII VALIDATION (Luhn mod-10, the public ISO/IEC 7812 check
    // every PAN detector runs): candidate account numbers are derived
    // deterministically from ids (the testdata carries no 13–16-digit runs,
    // so the candidate column is synthesized; the OPERATOR — checksum
    // classification folded into the scan — is the subject). The Luhn sum
    // runs as a codegen'd higher-order `transform`+`aggregate` over the
    // reversed digit array (position-indexed lambda — no UDF, no explode on
    // the Spark side), and the repair digit falls out of the same sum:
    // fix = (10 − (S − d₁) mod 10) mod 10. Scale shape: pure per-row map
    // folded into one pass + one small aggregate — zero shuffles beyond the
    // final per-type rollup; at 100 TB this is the cheapest possible shape
    // for a compliance scan. The oracle computes the identical sums via
    // row-explosion (DuckDB lambdas carry no index).
    Q("q252_pii_luhn",
      """WITH c AS (SELECT event_id, event_type,
        |    lpad(CAST(event_id * 1000003 + user_id * 7919 AS VARCHAR), 16, '0') AS pan
        |  FROM events),
        |d AS (SELECT event_id, event_type,
        |    unnest(string_split(reverse(pan), '')) AS ch,
        |    generate_subscripts(string_split(reverse(pan), ''), 1) AS i
        |  FROM c),
        |v AS (SELECT event_id, event_type,
        |    sum(CASE WHEN i % 2 = 1 THEN CAST(ch AS INT)
        |             WHEN 2 * CAST(ch AS INT) > 9 THEN 2 * CAST(ch AS INT) - 9
        |             ELSE 2 * CAST(ch AS INT) END) AS lsum,
        |    max(CASE WHEN i = 1 THEN CAST(ch AS INT) END) AS d1
        |  FROM d GROUP BY 1, 2)
        |SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n_candidates,
        |  CAST(sum(CASE WHEN lsum % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
        |  CAST(sum((10 - (lsum - d1) % 10) % 10) AS BIGINT) AS sum_fix_digit
        |FROM v GROUP BY 1""".stripMargin) { (s, dir) =>
      val ev = Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"))
        .withColumn("pan",
          lpad((col("event_id") * 1000003L + col("user_id") * 7919L)
            .cast("string"), 16, "0"))
        .withColumn("lsum", expr(
          """aggregate(
            |  transform(split(reverse(pan), '(?!$)'), (x, i) ->
            |    CASE WHEN i % 2 = 0 THEN CAST(x AS INT)
            |         WHEN 2 * CAST(x AS INT) > 9 THEN 2 * CAST(x AS INT) - 9
            |         ELSE 2 * CAST(x AS INT) END),
            |  0, (a, b) -> a + b)""".stripMargin))
        .withColumn("d1", substring(col("pan"), 16, 1).cast("int"))
      ev.groupBy(col("event_type"))
        .agg(count(lit(1)).cast("bigint").as("n_candidates"),
          sum(when(col("lsum") % 10 === 0, 1).otherwise(0)).cast("bigint")
            .as("n_valid"),
          sum((lit(10) - (col("lsum") - col("d1")) % 10) % 10).cast("bigint")
            .as("sum_fix_digit"))
    },

    // ---------------------------------------------------------------- q272
    // CURRICULUM INTERLEAVING — the anti-clustering training order: docs
    // are ranked into quality deciles by EXACT global rank (the
    // q235/q250/q260 distributed-rank discipline — no sampling), shuffled
    // WITHIN each decile by the salted-hash order (q241's
    // content-addressed shuffle), and assigned position
    // (within-decile-rank − 1) × 10 + decile — so consecutive training
    // positions cycle through all ten deciles and no batch is ever a
    // homogeneous quality block (the failure mode curriculum papers and
    // every data-loader's `group_by` warning document). Positions are
    // unique by construction; the oracle replays rank, shuffle, and
    // position arithmetic verbatim. Scale shape: one range shuffle for
    // the global rank, one keyed window per decile — no global window
    // over the corpus.
    Q("q272_curriculum_interleave",
      """WITH r AS (SELECT doc_id, n_chars,
        |    row_number() OVER (ORDER BY n_chars, doc_id) AS rn,
        |    count(*) OVER () AS n
        |  FROM documents),
        |d AS (SELECT doc_id, n_chars, ((rn - 1) * 10) // n AS decile FROM r),
        |p AS (SELECT doc_id, n_chars, decile,
        |    (row_number() OVER (PARTITION BY decile
        |       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1) * 10
        |      + decile AS pos
        |  FROM d)
        |SELECT CAST(decile AS BIGINT) AS decile,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(min(pos) AS BIGINT) AS min_pos,
        |  CAST(max(pos) AS BIGINT) AS max_pos,
        |  CAST(sum(pos) AS BIGINT) AS pos_sum
        |FROM p GROUP BY 1""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
      val n = docs.count()
      val ranked = graft.ops.SurrogateKeys.assign(docs, "rn", 0L,
        Seq("n_chars", "doc_id"))
      val positioned = ranked
        .withColumn("decile", expr(s"((rn - 1) * 10) div $n"))
        .withColumn("pos", (row_number().over(Window.partitionBy(col("decile"))
          .orderBy(md5(col("doc_id").cast("string").cast("binary")).asc,
            col("doc_id").asc)) - 1) * 10 + col("decile"))
        .localCheckpoint()
      // positions are a collision-free training order
      require(positioned.select(col("pos")).distinct().count() == n,
        "q272: training positions must be unique")
      positioned.groupBy(col("decile").cast("bigint").as("decile"))
        .agg(count(lit(1)).cast("bigint").as("n_docs"),
          min(col("pos")).cast("bigint").as("min_pos"),
          max(col("pos")).cast("bigint").as("max_pos"),
          sum(col("pos")).cast("bigint").as("pos_sum"))
    },

    // ---------------------------------------------------------------- q273
    // LENGTH-GROUPED BATCHING — the padding-waste accounting behind every
    // trainer's `group_by_length`: fixed batches of 32 docs cost
    // 32 × max(len) tokens each (the padded tensor), so the waste is
    // Σ(batchMax − len). Both strategies are computed exactly — arrival
    // order (by doc_id) vs length-sorted order — with the SAME integer
    // batch arithmetic, and the sorted order is require'd to waste no
    // more than arrival order (it provably minimizes Σ batchMax among
    // all orders). Output is the per-strategy ledger a pipeline would
    // publish: batches, real tokens, padded tokens, waste. Scale shape:
    // one range shuffle per strategy for the global order (q246's
    // distributed ORDER BY), one keyed aggregate per batch — the
    // padded-token column is why this op exists at 100 TB: 30 % waste is
    // 30 % of the training bill.
    Q("q273_length_batching", {
      def ledger(order: String, tag: String) =
        s"""SELECT '$tag' AS strategy, CAST(count(*) AS BIGINT) AS n_batches,
           |  CAST(sum(toks) AS BIGINT) AS real_tokens,
           |  CAST(sum(bmax * bn) AS BIGINT) AS padded_tokens,
           |  CAST(sum(bmax * bn - toks) AS BIGINT) AS padding_waste
           |FROM (
           |  SELECT batch, sum(n_tokens) AS toks, max(n_tokens) AS bmax,
           |    count(*) AS bn
           |  FROM (SELECT n_tokens,
           |      (row_number() OVER (ORDER BY $order) - 1) // 32 AS batch
           |    FROM t)
           |  GROUP BY 1)""".stripMargin
      s"""WITH t AS (SELECT doc_id,
        |    len(string_split_regex(trim(text), '\\s+')) AS n_tokens
        |  FROM documents)
        |${ledger("doc_id", "arrival")}
        |UNION ALL
        |${ledger("n_tokens, doc_id", "sorted")}""".stripMargin
    }) { (s, dir) =>
      import graft.ops.SurrogateKeys
      val t = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      def ledger(orderCols: Seq[String], tag: String) =
        SurrogateKeys.assign(t, "rn", 0L, orderCols)
          .withColumn("batch", expr("(rn - 1) div 32"))
          .groupBy(col("batch"))
          .agg(sum(col("n_tokens")).as("toks"),
            max(col("n_tokens")).as("bmax"), count(lit(1)).as("bn"))
          .agg(count(lit(1)).cast("bigint").as("n_batches"),
            sum(col("toks")).cast("bigint").as("real_tokens"),
            sum(col("bmax") * col("bn")).cast("bigint").as("padded_tokens"),
            sum(col("bmax") * col("bn") - col("toks")).cast("bigint")
              .as("padding_waste"))
          .withColumn("strategy", lit(tag))
          .select(col("strategy"), col("n_batches"), col("real_tokens"),
            col("padded_tokens"), col("padding_waste"))
      val arrival = ledger(Seq("doc_id"), "arrival").localCheckpoint()
      val sorted = ledger(Seq("n_tokens", "doc_id"), "sorted").localCheckpoint()
      val (wa, ws) = (arrival.head.getAs[Long]("padding_waste"),
        sorted.head.getAs[Long]("padding_waste"))
      require(ws <= wa,
        s"q273: length-sorted batching must not waste more ($ws vs $wa)")
      arrival.unionByName(sorted)
    },

    // ---------------------------------------------------------------- q276
    // SPAN CORRUPTION ACCOUNTING — the T5/UL2 denoising-objective prep:
    // each document's token stream is cut into 20-token blocks; in each
    // block ONE mask span of up to 3 tokens starts at a position drawn
    // DETERMINISTICALLY from md5(doc_id:block) — so the masking is
    // non-overlapping and ≤15 % by construction, and the whole corruption
    // is replayable bit-for-bit across engines and epochs (the property
    // a random.random() masker cannot give a resumable pipeline). The
    // per-block span count IS the sentinel-token count. Scale shape: one
    // posexplode + integer arithmetic, one rollup — no state, no UDF.
    // The oracle replays block, hash, and clip arithmetic verbatim.
    Q("q276_span_corruption",
      """WITH t AS (SELECT doc_id, lang,
        |    unnest(string_split_regex(trim(text), '\s+')) AS tok,
        |    generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS idx
        |  FROM documents),
        |b AS (SELECT doc_id, lang, (idx - 1) // 20 AS blk,
        |    (idx - 1) % 20 AS pos FROM t),
        |h AS (SELECT doc_id, lang, blk, pos,
        |    CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':'
        |      || CAST(blk AS VARCHAR)), 1, 8) AS BIGINT) % 17 AS BIGINT) AS s
        |  FROM b),
        |m AS (SELECT doc_id, lang, blk,
        |    CAST(count(*) AS BIGINT) AS block_len,
        |    CAST(sum(CASE WHEN pos >= s AND pos < s + 3 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS masked
        |  FROM h GROUP BY 1, 2, 3, s)
        |SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(sum(block_len) AS BIGINT) AS total_tokens,
        |  CAST(sum(masked) AS BIGINT) AS masked_tokens,
        |  CAST(sum(CASE WHEN masked > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_spans
        |FROM m GROUP BY 1""".stripMargin) { (s, dir) =>
      val toks = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          posexplode(split(trim(col("text")), "\\s+")).as(Seq("i", "tok")))
        .withColumn("blk", expr("i div 20"))
        .withColumn("pos", col("i") % 20)
        .withColumn("start",
          expr("conv(substring(md5(CAST(concat(doc_id, ':', blk) AS BINARY))," +
            " 1, 8), 16, 10)").cast("long") % 17)
      val blocks = toks.groupBy(col("doc_id"), col("lang"), col("blk"),
          col("start"))
        .agg(count(lit(1)).cast("bigint").as("block_len"),
          sum(when(col("pos") >= col("start") &&
            col("pos") < col("start") + 3, 1L).otherwise(0L))
            .cast("bigint").as("masked"))
        .localCheckpoint()
      // the construction bounds masking at 15% of every full block
      val full = blocks.filter(col("block_len") === 20)
      require(full.filter(col("masked") > 3).isEmpty,
        "q276: a block masked more than its span budget")
      blocks.groupBy(col("lang"))
        .agg(countDistinct(col("doc_id")).cast("bigint").as("n_docs"),
          sum(col("block_len")).cast("bigint").as("total_tokens"),
          sum(col("masked")).cast("bigint").as("masked_tokens"),
          sum(when(col("masked") > 0, 1L).otherwise(0L)).cast("bigint")
            .as("n_spans"))
    },

    // ---------------------------------------------------------------- q285
    // REPRODUCIBLE EXPORT WITH PER-SHARD RECEIPTS — q241's sharded
    // training export hardened with q279's digests: two INDEPENDENT runs
    // of the export land on disk, and each shard's read-back content
    // digest (xor of per-row 60-bit md5 — order/layout-independent) is
    // require'd IDENTICAL across the runs, so a resumed or re-run export
    // is provably the same dataset file-for-file; a different epoch salt
    // flips every shard's membership AND digest (the receipt binds
    // content, not counts — pinned). The digest column itself ships in
    // the result, and the ORACLE RECOMPUTES IT in DuckDB from the same
    // md5 arithmetic — the cross-engine reproducibility statement is
    // graded by the driver's own hash compare. At 100 TB: a per-shard
    // receipt is what lets a training job trust a resumable export
    // without re-reading it.
    Q("q285_reproducible_export",
      """WITH t AS (SELECT doc_id,
        |    len(string_split_regex(trim(text), '\s+')) AS n_tok,
        |    md5('epoch1|' || CAST(doc_id AS VARCHAR)) AS sk
        |  FROM documents),
        |sh AS (SELECT doc_id, n_tok,
        |    CAST('0x' || substring(sk, 1, 6) AS BIGINT) % 8 AS shard FROM t),
        |h AS (SELECT shard, doc_id, n_tok,
        |    CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)
        |      || chr(1) || CAST(n_tok AS VARCHAR)), 1, 15) AS BIGINT)
        |      AS BIGINT) AS rh
        |  FROM sh)
        |SELECT CAST(shard AS BIGINT) AS shard,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(bit_xor(rh) AS BIGINT) AS digest
        |FROM h GROUP BY 1""".stripMargin) { (s, dir) =>
      import graft.ops.TableChecksum
      val root = Q.scratch(s, dir, "q285")
      def export(salt: String, out: String): Unit =
        Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            size(graft.dedup.MinHashLSH.tokensCol(col("text"))).as("n_tok"),
            md5(concat(lit(salt), col("doc_id").cast("string"))).as("sk"))
          .withColumn("shard", expr(
            "CAST(conv(substring(sk, 1, 6), 16, 10) AS BIGINT) % 8"))
          .select(col("doc_id"), col("n_tok"), col("shard"))
          .write.partitionBy("shard").mode("overwrite").parquet(out)
      def receipts(out: String) =
        s.read.option("basePath", out).parquet(out)
          .groupBy(col("shard").cast("bigint").as("shard"))
          .agg(count(lit(1)).cast("bigint").as("n_docs"),
            bit_xor(TableChecksum.rowHash(Seq(col("doc_id"), col("n_tok"))))
              .cast("bigint").as("digest"))
      export("epoch1|", s"$root/e1")
      export("epoch1|", s"$root/e2") // an independent re-run
      val r1 = receipts(s"$root/e1").localCheckpoint()
      val r2 = receipts(s"$root/e2")
      require(Q.sameMultiset(r1, r2),
        "q285: two independent export runs must carry identical receipts")
      // the receipt binds CONTENT: a new epoch salt must change digests
      export("epoch2|", s"$root/e3")
      require(!receipts(s"$root/e3").exceptAll(r1).isEmpty,
        "q285: a different epoch's export must not share the receipts")
      r1
    })
}
