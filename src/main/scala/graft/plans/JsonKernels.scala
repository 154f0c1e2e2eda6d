package graft.plans

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.unsafe.types.UTF8String

/** RFC 7386 JSON Merge Patch on the Jackson parser Spark already
  * ships: null patch values delete keys, nested objects merge
  * recursively, anything else replaces. Malformed input → null
  * (the forgiving-conversion convention). Called via codegen'd
  * StaticInvoke. */
object JsonKernels {
  private val mapper = new ObjectMapper()

  def mergePatch(a: UTF8String, b: UTF8String): UTF8String = {
    if (a == null || b == null) return null
    try {
      val merged = merge(mapper.readTree(a.toString), mapper.readTree(b.toString))
      UTF8String.fromString(mapper.writeValueAsString(merged))
    } catch { case _: Exception => null }
  }

  /** JSONExtractArrayRaw: each top-level array element as its raw
    * JSON text — string scalars stay QUOTED (`"a"`, not `a`), unlike
    * get_json_object, so the documented ArrayRaw-then-JSONExtract
    * idiom round-trips every element type. Elements re-serialize
    * compactly (insignificant whitespace normalized — the one
    * deviation from CH's byte-slice raw). Non-array or malformed
    * input degrades to [] (CH's convention). */
  def arrayRaw(j: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val empty = new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    if (j == null) return null
    try {
      val root = mapper.readTree(j.toString)
      if (root == null || !root.isArray) return empty
      val out = new Array[Any](root.size())
      var i = 0
      while (i < root.size()) {
        out(i) = UTF8String.fromString(mapper.writeValueAsString(root.get(i)))
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    } catch { case _: Exception => empty }
  }

  private def merge(target: JsonNode, patch: JsonNode): JsonNode =
    if (!patch.isObject) patch
    else {
      // RFC 7386: a non-object target is replaced by {} first, so
      // null-valued patch keys are dropped rather than copied
      val out: ObjectNode =
        if (target.isObject) target.deepCopy().asInstanceOf[ObjectNode]
        else mapper.createObjectNode()
      val it = patch.properties().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue.isNull) out.remove(e.getKey)
        else if (out.has(e.getKey)) out.set(e.getKey, merge(out.get(e.getKey), e.getValue))
        else out.set(e.getKey, merge(mapper.createObjectNode(), e.getValue))
      }
      out
    }
}
