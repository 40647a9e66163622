package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** CRD schema contract — no cluster needed: parse the committed
  * GraftSync CRD's openAPIV3Schema and validate every committed example
  * (and the operator ConfigMap's embedded resource) against it with a
  * small OpenAPI-v3 checker. The point is DRIFT: if an example, the
  * Reconciler's accepted manifest shape, or the CRD schema itself moves
  * without the others, this spec fails before kubectl ever would.
  */
class DeploySpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def yamlDocs(text: String): Seq[JsonNode] =
    new org.yaml.snakeyaml.Yaml().loadAll(text).asScala.toSeq
      .filter(_ != null).map(mapper.valueToTree[JsonNode])

  private def readDocs(path: String): Seq[JsonNode] =
    yamlDocs(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))

  private lazy val crd: JsonNode = readDocs("deploy/crds/graftsync-crd.yaml").head

  private lazy val schema: JsonNode = {
    val versions = crd.path("spec").path("versions").elements().asScala.toSeq
    val v = versions.find(_.path("name").asText == "v1alpha1")
      .getOrElse(fail("CRD must serve v1alpha1"))
    v.path("schema").path("openAPIV3Schema")
  }

  // ---- a small openAPIV3Schema validator (the subset the CRD uses) --------

  private def validate(node: JsonNode, sch: JsonNode, path: String): Seq[String] = {
    val errs = Seq.newBuilder[String]
    val tpe = sch.path("type").asText("")
    tpe match {
      case "object" =>
        if (!node.isObject) errs += s"$path: expected object, got ${node.getNodeType}"
        else {
          sch.path("required").elements().asScala.foreach { r =>
            if (!node.has(r.asText)) errs += s"$path: missing required '${r.asText}'"
          }
          val props = sch.path("properties")
          if (props.isObject) node.properties().asScala.foreach { e =>
            val sub = props.path(e.getKey)
            if (!sub.isMissingNode)
              errs ++= validate(e.getValue, sub, s"$path.${e.getKey}")
            // absent from properties: OpenAPI default is allow (no
            // additionalProperties:false anywhere in this CRD)
          }
        }
      case "array" =>
        if (!node.isArray) errs += s"$path: expected array"
        else {
          val max = sch.path("maxItems")
          if (max.isInt && node.size() > max.asInt)
            errs += s"$path: ${node.size()} items > maxItems ${max.asInt}"
          val items = sch.path("items")
          if (!items.isMissingNode)
            node.elements().asScala.zipWithIndex.foreach { case (el, i) =>
              errs ++= validate(el, items, s"$path[$i]")
            }
        }
      case "string" =>
        if (!node.isTextual) errs += s"$path: expected string"
        else {
          val s = node.asText
          val pat = sch.path("pattern")
          if (pat.isTextual && !java.util.regex.Pattern.compile(pat.asText)
              .matcher(s).find())
            errs += s"$path: '$s' !~ pattern ${pat.asText}"
          val maxLen = sch.path("maxLength")
          if (maxLen.isInt && s.length > maxLen.asInt)
            errs += s"$path: length ${s.length} > maxLength"
          val en = sch.path("enum")
          if (en.isArray &&
              !en.elements().asScala.exists(_.asText == s))
            errs += s"$path: '$s' not in enum"
        }
      case "integer" =>
        if (!node.isIntegralNumber) errs += s"$path: expected integer"
        else {
          val v = node.asLong
          if (sch.path("minimum").isNumber && v < sch.path("minimum").asLong)
            errs += s"$path: $v < minimum"
          if (sch.path("maximum").isNumber && v > sch.path("maximum").asLong)
            errs += s"$path: $v > maximum"
        }
      case "number" =>
        if (!node.isNumber) errs += s"$path: expected number"
        else if (sch.path("minimum").isNumber &&
            node.asDouble < sch.path("minimum").asDouble)
          errs += s"$path: ${node.asDouble} < minimum"
      case "boolean" =>
        if (!node.isBoolean) errs += s"$path: expected boolean"
      case "" => // no type constraint at this level
      case other => errs += s"$path: unsupported schema type '$other'"
    }
    errs.result()
  }

  private def validateManifest(doc: JsonNode): Seq[String] = {
    val errs = Seq.newBuilder[String]
    val group = crd.path("spec").path("group").asText
    val kind = crd.path("spec").path("names").path("kind").asText
    if (doc.path("apiVersion").asText != s"$group/v1alpha1")
      errs += s"apiVersion ${doc.path("apiVersion").asText} != $group/v1alpha1"
    if (doc.path("kind").asText != kind)
      errs += s"kind ${doc.path("kind").asText} != $kind"
    errs ++= validate(doc, schema, "$")
    errs.result()
  }

  // ---- contracts ------------------------------------------------------------

  test("CRD declares the GraftSync surface the reconciler serves") {
    assert(crd.path("kind").asText == "CustomResourceDefinition")
    assert(crd.path("spec").path("group").asText == "graft.dev")
    assert(crd.path("spec").path("names").path("kind").asText == "GraftSync")
    // spec schema requires the trio every sync needs
    val req = schema.path("properties").path("spec").path("required")
      .elements().asScala.map(_.asText).toSet
    assert(req == Set("syncType", "target", "destination"))
    // the syncType enum is the documented job surface (model.SyncJobSpec)
    val en = schema.path("properties").path("spec").path("properties")
      .path("syncType").path("enum").elements().asScala.map(_.asText).toSet
    assert(en == Set("single", "batch", "jql", "epic", "incremental"))
    // the status phase enum covers every phase the Reconciler publishes
    // (Scheduled/Pending/Running/Completed/Failed/Retrying + unset)
    val phases = schema.path("properties").path("status").path("properties")
      .path("phase").path("enum").elements().asScala.map(_.asText).toSet
    assert(Set("Scheduled", "Pending", "Running", "Completed", "Failed",
      "Retrying").subsetOf(phases),
      s"CRD phase enum $phases must cover the Reconciler's phase machine")
  }

  test("every committed example validates against the CRD schema") {
    val files = java.nio.file.Files.list(java.nio.file.Paths.get("deploy/examples"))
      .iterator().asScala.toSeq.map(_.toString).filter(_.endsWith(".yaml"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val docs = readDocs(f)
      assert(docs.nonEmpty, s"$f holds no documents")
      docs.foreach { d =>
        val errs = validateManifest(d)
        assert(errs.isEmpty, s"$f invalid against CRD: ${errs.mkString("; ")}")
      }
    }
  }

  test("the operator ConfigMap's embedded resource is CRD-valid and reconciler-parseable") {
    val cm = readDocs("deploy/operator.yaml")
      .find(d => d.path("kind").asText == "ConfigMap" &&
        d.path("metadata").path("name").asText == "graft-resources")
      .getOrElse(fail("operator.yaml must ship the graft-resources ConfigMap"))
    val data = cm.path("data").properties().asScala.toSeq
    assert(data.nonEmpty)
    data.foreach { e =>
      val docs = yamlDocs(e.getValue.asText)
      docs.filter(_.path("kind").asText == "GraftSync").foreach { d =>
        val errs = validateManifest(d)
        assert(errs.isEmpty,
          s"ConfigMap ${e.getKey} invalid against CRD: ${errs.mkString("; ")}")
      }
      // and the SAME text is what `serve --reconcile` ingests — both ends of
      // the contract hold on one artifact
      val tmp = java.nio.file.Files.createTempFile("graft-deploy", ".yaml")
      java.nio.file.Files.writeString(tmp, e.getValue.asText)
      assert(Cli.parseResources(tmp.toString).nonEmpty)
      java.nio.file.Files.deleteIfExists(tmp)
    }
  }

  test("schema violations are caught, not waved through (validator is non-vacuous)") {
    val good = readDocs("deploy/examples/graftsync-example.yaml").head
    assert(validateManifest(good).isEmpty)
    def mutate(f: com.fasterxml.jackson.databind.node.ObjectNode => Unit): JsonNode = {
      val copy = good.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
      f(copy)
      copy
    }
    def spec(d: JsonNode) =
      d.path("spec").asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    // enum violation
    assert(validateManifest(mutate(d => spec(d).put("syncType", "cron")))
      .exists(_.contains("not in enum")))
    // required violation
    assert(validateManifest(mutate(d => spec(d).remove("destination")))
      .exists(_.contains("missing required 'destination'")))
    assert(validateManifest(mutate { d =>
      spec(d).path("destination")
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        .remove("repository")
    }).exists(_.contains("missing required 'repository'")))
    // pattern violation (5-field cron)
    assert(validateManifest(mutate(d => spec(d).put("schedule", "hourly")))
      .exists(_.contains("pattern")))
    // issue-key pattern + numeric bounds
    assert(validateManifest(mutate { d =>
      val t = spec(d).putObject("target")
      t.putArray("issueKeys").add("not a key")
    }).exists(_.contains("pattern")))
    assert(validateManifest(mutate { d =>
      spec(d).putObject("retryPolicy").put("maxRetries", 99)
    }).exists(_.contains("maximum")))
    assert(validateManifest(mutate { d =>
      spec(d).putObject("retryPolicy").put("backoffMultiplier", 0.5)
    }).exists(_.contains("minimum")))
    // type violation
    assert(validateManifest(mutate(d => spec(d).put("dryRun", "yes")))
      .exists(_.contains("expected boolean")))
    // a foreign kind neither validates here nor parses in the reconciler
    val deployment = mapper.readTree(
      """{"apiVersion":"apps/v1","kind":"Deployment",
        |"metadata":{"name":"oops"},"spec":{"replicas":1}}""".stripMargin)
    assert(validateManifest(deployment).nonEmpty)
  }
}
