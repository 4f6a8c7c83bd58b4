package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode, JsonNodeFactory}
import scala.jdk.CollectionConverters._

/** F21: DynamoDB-attribute-JSON decoder (SURVEY.md §2.7 F21).
  *
  * Reference `lambda/odl_ddb_update_es/json_util.py:48-104` decodes the
  * typed DynamoDB wire shape (`{"S": "x"}`, `{"N": "1"}`, `{"M": {...}}`,
  * `{"L": [...]}`, `{"SS"/"NS"/"BS": [...]}`, `{"BOOL": b}`,
  * `{"NULL": true}`) into plain values. Here: typed JSON string →
  * plain JSON string (numbers stay numeric), usable with `from_json`
  * downstream. Jackson is already on Spark's classpath.
  */
object DdbJson {

  private val mapper = new ObjectMapper()
  private val nf = JsonNodeFactory.instance

  private def decodeAttr(node: JsonNode): JsonNode = {
    val field = node.fields().asScala.toSeq.headOption
    field match {
      case Some(e) => e.getKey match {
        case "S" => e.getValue
        case "N" =>
          val t = e.getValue.asText
          if (t.contains('.') || t.contains('e') || t.contains('E'))
            nf.numberNode(java.math.BigDecimal.valueOf(t.toDouble))
          else nf.numberNode(t.toLong)
        case "B" => e.getValue
        case "BOOL" => nf.booleanNode(e.getValue.asBoolean)
        case "NULL" => nf.nullNode
        case "SS" | "BS" => e.getValue
        case "NS" =>
          val arr = nf.arrayNode()
          e.getValue.elements().asScala.foreach { v =>
            val t = v.asText
            if (t.contains('.')) arr.add(t.toDouble) else arr.add(t.toLong)
          }
          arr
        case "L" =>
          val arr = nf.arrayNode()
          e.getValue.elements().asScala.foreach(v => arr.add(decodeAttr(v)))
          arr
        case "M" => decodeMap(e.getValue)
        case _ => node // unknown tag: passthrough
      }
      case None => node
    }
  }

  private def decodeMap(node: JsonNode): ObjectNode = {
    val out = nf.objectNode()
    node.fields().asScala.foreach(e => out.set[JsonNode](e.getKey, decodeAttr(e.getValue)))
    out
  }

  /** Decode a full DynamoDB item image (map of attr-name → typed attr)
    * into a plain JSON object string. Invalid JSON → null. */
  def decodeItem(json: String): String = {
    if (json == null) return null
    try mapper.writeValueAsString(decodeMap(mapper.readTree(json)))
    catch { case _: Exception => null }
  }

  val decodeItemUdf = udf((s: String) => decodeItem(s))

  def decodeDdbJson(c: Column): Column = decodeItemUdf(c)
}
