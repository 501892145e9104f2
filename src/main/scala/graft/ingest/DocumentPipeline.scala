package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.model.Model.{Labels, RelTypes}
import graft.store.GraphStore

/** Markdown/document ingest frontend — the Spark-native re-expression of
  * the reference's document indexer (`pkg/indexer/documents/`):
  *
  *   - title extraction: first `# ` header else first non-empty line
  *     (`parser.go:193-213`);
  *   - doc-type inference from filename keywords (`parser.go:215-241`);
  *   - paragraph chunking to ≤ maxChunkWords words (`parser.go:51-90`);
  *   - feature extraction: `Feature:`/`Requirement:` lines + `##`/`###`
  *     section headers minus a generic-header skip list
  *     (`parser.go:109-162`, `parser.go:287-303`);
  *   - status inference from keywords (`parser.go:259-285`);
  *   - feature dedup/merge: normalized name, longest description wins,
  *     tag union (`parser.go:165-189`);
  *   - backtick code-token extraction + stop list (`parser.go:343-382`);
  *   - MENTIONS linking: token ⋈ symbol substring match, ≤5 per token
  *     (`indexer.go:127-162`).
  *
  * Everything except the stateful chunk fold is column expressions; the
  * fold is a typed flatMap (SURVEY §2.9). The whole pipeline is two
  * DataFrame writes — no per-row round-trips (vs `indexer.go:107-162`,
  * one MERGE per entity).
  */
object DocumentPipeline {

  val genericHeaders: Set[String] = Set(
    "introduction", "overview", "summary", "conclusion", "contents",
    "table of contents", "background", "references", "appendix",
    "getting started", "usage", "installation", "license")

  val tokenStopwords: Set[String] = Set(
    "the", "and", "for", "with", "this", "that", "true", "false",
    "nil", "null", "func", "var", "int", "string", "bool", "error")

  /** First `# ` header, else first non-empty line, else the path tail. */
  def titleOf(content: Column, path: Column): Column = {
    val header = regexp_extract(content, "(?m)^#\\s+(.+)$", 1)
    val firstLine = regexp_extract(content, "(?m)^\\s*(\\S.*)$", 1)
    when(length(header) > 0, header)
      .when(length(firstLine) > 0, firstLine)
      .otherwise(element_at(split(path, "/"), -1))
  }

  /** Doc type from filename keywords. */
  def docTypeOf(path: Column): Column = {
    val f = lower(element_at(split(path, "/"), -1))
    when(f.contains("readme"), "readme")
      .when(f.contains("rfc"), "rfc")
      .when(f.contains("architecture") || f.contains("design"), "architecture")
      .when(f.contains("api"), "api_documentation")
      .when(f.contains("changelog") || f.contains("release"), "changelog")
      .otherwise("documentation")
  }

  /** Status from keywords (first match wins, reference keyword map). */
  def statusOf(text: Column): Column = {
    val t = lower(text)
    when(t.contains("completed") || t.contains("done") ||
      t.contains("implemented") || t.contains("finished"), "completed")
      .when(t.contains("in progress") || t.contains("wip") ||
        t.contains("ongoing") || t.contains("under development"),
        "in_progress")
      .when(t.contains("planned") || t.contains("todo") ||
        t.contains("future") || t.contains("proposed"), "planned")
      .otherwise("unknown")
  }

  /** Fold paragraphs into chunks of ≤ maxChunkWords words. Greedy fold,
    * paragraph boundaries preserved; one output row per chunk. */
  def chunk(text: String, maxChunkWords: Int): Seq[String] = {
    val paras = text.split("\n\\s*\n").toSeq.map(_.trim).filter(_.nonEmpty)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var curWords = 0
    def flush(): Unit = if (curWords > 0) {
      out += cur.toString.trim; cur.clear(); curWords = 0
    }
    paras.foreach { p =>
      val w = p.split("\\s+").length
      if (curWords > 0 && curWords + w > maxChunkWords) flush()
      cur.append(p).append("\n\n"); curWords += w
      if (curWords >= maxChunkWords) flush()
    }
    flush()
    if (out.isEmpty) Seq("") else out.toSeq
  }

  /** docs(path, content) → one row per chunk with document metadata.
    * sourceUrl = path for chunk 0, path#chunkN after (merge key —
    * `documents/indexer.go:107-108`). */
  def chunkedDocuments(docs: DataFrame,
      maxChunkWords: Int = 1000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val chunked = docs.select(col("path").cast("string"),
        col("content").cast("string"))
      .as[(String, String)]
      .flatMap { case (path, content) =>
        chunk(content, maxChunkWords).zipWithIndex.map {
          case (c, i) => (path, i, c)
        }
      }
      .toDF("path", "chunkIndex", "chunkContent")
    chunked.select(
      when(col("chunkIndex") === 0, col("path"))
        .otherwise(concat(col("path"), lit("#chunk"), col("chunkIndex")))
        .as("sourceUrl"),
      col("path"), col("chunkIndex"),
      titleOf(col("chunkContent"), col("path")).as("title"),
      docTypeOf(col("path")).as("type"),
      col("chunkContent").as("content"))
  }

  /** Extract candidate features from chunk content: `Feature:` /
    * `Requirement:` / `Implements:` lines and `##`/`###` headers (minus
    * generic ones). Returns (sourceUrl, featureName, description, status,
    * tags). */
  def extractFeatures(chunks: DataFrame): DataFrame = {
    val lineFeatures = chunks.select(col("sourceUrl"), col("content"),
        explode(expr(
          "regexp_extract_all(content, '(?im)^(?:feature|requirement|implements):\\\\s*(.+)$', 1)"))
          .as("featureName"))
      .withColumn("tag", lit("declared"))
    val headerFeatures = chunks.select(col("sourceUrl"), col("content"),
        explode(expr(
          "regexp_extract_all(content, '(?m)^#{2,3}\\\\s+(.+)$', 1)"))
          .as("featureName"))
      .filter(!lower(trim(col("featureName")))
        .isin(genericHeaders.toSeq: _*))
      .withColumn("tag", lit("section"))
    lineFeatures.unionByName(headerFeatures)
      .select(col("sourceUrl"),
        trim(col("featureName")).as("featureName"),
        // description: the paragraph around the mention — approximated by
        // the first 200 chars of the chunk (reference keeps chunk text)
        substring(col("content"), 1, 200).as("description"),
        statusOf(col("content")).as("status"),
        array(col("tag")).as("tags"))
      .filter(length(col("featureName")) > 0)
  }

  /** Feature dedup/merge (`parser.go:165-189`): normalize the name
    * (lower/trim/whitespace-collapse), keep the longest description,
    * union + dedup tags, most-advanced status wins
    * (completed > in_progress > planned > unknown). */
  def mergeFeatures(features: DataFrame): DataFrame = {
    val norm = trim(regexp_replace(lower(col("featureName")), "\\s+", " "))
    val statusRank = when(col("status") === "completed", 3)
      .when(col("status") === "in_progress", 2)
      .when(col("status") === "planned", 1).otherwise(0)
    features
      .withColumn("normName", norm)
      .withColumn("statusRank", statusRank)
      .groupBy(col("normName"))
      .agg(
        max(struct(length(col("description")).as("len"),
          col("description").as("d"))).getField("d").as("description"),
        array_distinct(flatten(collect_list(col("tags")))).as("tags"),
        max(struct(col("statusRank"), col("status").as("s")))
          .getField("s").as("status"),
        min(col("featureName")).as("name"),
        count(lit(1)).as("nMentions"))
  }

  /** Backtick code tokens per chunk, stop-listed, len > 2, distinct. */
  def codeTokens(chunks: DataFrame): DataFrame =
    chunks.select(col("sourceUrl"),
        explode(expr("regexp_extract_all(content, '`([^`]+)`', 1)"))
          .as("token"))
      .filter(length(col("token")) > 2 &&
        !lower(col("token")).isin(tokenStopwords.toSeq: _*))
      .distinct()

  /** MENTIONS linking (J8): substring θ-join doc-token × symbol, capped
    * at 5 symbols per token (reference LIMIT 5,
    * `documents/indexer.go:136`). Symbols side broadcast — it is the
    * dimension here; the cap is a per-token row_number window. */
  def linkMentions(tokens: DataFrame, symbols: DataFrame,
      perTokenLimit: Int = 5): DataFrame = {
    val syms = broadcast(symbols.select(col("id").as("symbolId"),
      col("symbol"), coalesce(col("displayName"), lit("")).as("displayName")))
    val matched = tokens.join(syms,
      col("symbol").contains(col("token")) ||
      col("displayName").contains(col("token")))
    val w = Window.partitionBy(col("sourceUrl"), col("token"))
      .orderBy(col("symbol"), col("symbolId"))
    matched.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= perTokenLimit)
      .select(col("sourceUrl"), col("token"), col("symbolId"))
  }

  /** Full ingest: docs(path, content) → Document + Feature nodes,
    * DESCRIBES + MENTIONS edges, MERGE-written through the store. */
  def ingest(store: GraphStore, docs: DataFrame,
      maxChunkWords: Int = 1000): Unit = {
    val chunks = chunkedDocuments(docs, maxChunkWords).cache()
    val docNodes = chunks.select(
      lit(Labels.Document).as("label"), col("sourceUrl"),
      col("title").as("name"), col("title"), col("type"), col("content"))
    val feats = extractFeatures(chunks)
    val merged = mergeFeatures(feats)
    val featNodes = merged.select(lit(Labels.Feature).as("label"),
      col("name"), col("description").as("docstring"), col("status"),
      col("tags"))
    store.mergeNodes(GraphStore.unionNodeFamilies(
      Seq(docNodes, featNodes)))

    val docIds = GraphStore.ensureNodeIds(docNodes)
      .select(col("id").as("docId"), col("sourceUrl"))
    val featIds = GraphStore.ensureNodeIds(featNodes)
      .select(col("id").as("featId"), col("name"))
    val describes = feats
      .withColumn("normName",
        trim(regexp_replace(lower(col("featureName")), "\\s+", " ")))
      .join(merged.select(col("normName"), col("name")), Seq("normName"))
      .join(featIds, Seq("name"))
      .join(docIds, Seq("sourceUrl"))
      .select(col("docId").as("src"), col("featId").as("dst"),
        lit(RelTypes.Describes).as("relType"))
      .distinct()

    val symbols = store.nodesByLabel(Labels.Symbol)
    val edgeFamilies =
      if (symbols.isEmpty) Seq(describes)
      else {
        val mentions = linkMentions(codeTokens(chunks), symbols)
          .join(docIds, Seq("sourceUrl"))
          .select(col("docId").as("src"), col("symbolId").as("dst"),
            lit(RelTypes.Mentions).as("relType"),
            col("token").as("context"))
          .distinct()
        Seq(describes, mentions)
      }
    store.mergeEdges(GraphStore.unionEdgeFamilies(edgeFamilies))
    chunks.unpersist()
  }
}
