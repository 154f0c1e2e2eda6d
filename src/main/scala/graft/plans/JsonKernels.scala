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
