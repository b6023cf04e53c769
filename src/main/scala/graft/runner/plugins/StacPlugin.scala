package graft.runner.plugins

import java.net.URI
import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.runner._

/** S3 — `stac_asset_download`: STAC search + asset fetch with
  * source-side pushdown (/root/reference/pipelines/sentinel/
  * download-sentinel2-l2a-michigan.yml:43-59): spatial `bbox`, temporal
  * `datetime` range, property filter `query_json`
  * (`{"eo:cloud_cover":{"lt":20}}`), asset projection `asset_keys`,
  * paging `page_size`/`max_items` (0 = unlimited), `save_item_json`.
  *
  * The filters ARE the optimization: predicate + projection pushdown to
  * the source API (SURVEY §4), so only matching items/assets ever move.
  * `file://` api_url points at a local FeatureCollection JSON — the same
  * filter/projection path, network-free (tests + air-gapped staging).
  */
object StacAssetDownloadPlugin extends StepPlugin {
  val name = "stac_asset_download"

  def run(ctx: StepContext): StepResult = {
    val out = Paths.get(ctx.argStr("out"))
    Files.createDirectories(out)
    val maxItems = ctx.argInt("max_items", 0)
    val items = search(ctx)
    val selected = if (maxItems > 0) items.take(maxItems) else items
    val assetKeys: Seq[String] = ctx.argOpt("asset_keys") match {
      case Some(l: Seq[_]) => l.map(_.toString)
      case _ => Seq.empty
    }
    var fetched = 0
    selected.foreach { item =>
      val id = item.getOrElse("id", "item").toString
      if (ctx.argBool("save_item_json", default = false)) {
        Files.writeString(out.resolve(s"$id.json"), JsonUtil.write(item))
      }
      val assets = item.getOrElse("assets", Map.empty)
        .asInstanceOf[Map[String, Any]]
      val wanted = if (assetKeys.isEmpty) assets
      else assets.view.filterKeys(assetKeys.contains(_)).toMap
      wanted.foreach { case (key, a) =>
        val href = a.asInstanceOf[Map[String, Any]]
          .getOrElse("href", "").toString
        if (href.nonEmpty) {
          val target = out.resolve(s"${id}_$key${ext(href)}")
          if (Ledger.shouldWrite(target, ctx.overwrite)) {
            stage(sign(href, ctx), target)
            fetched += 1
          }
        }
      }
    }
    StepResult(Map("n_items" -> selected.size, "n_assets" -> fetched,
      "out" -> out.toString))
  }

  private def ext(href: String): String = {
    val f = href.split('/').last
    val i = f.lastIndexOf('.')
    if (i >= 0) f.substring(i) else ""
  }

  private def stage(href: String, target: java.nio.file.Path): Unit = {
    val uri = URI.create(href)
    if (uri.getScheme == "file")
      Files.copy(Paths.get(uri), target, StandardCopyOption.REPLACE_EXISTING)
    else {
      val in = uri.toURL.openStream()
      try Files.copy(in, target, StandardCopyOption.REPLACE_EXISTING)
      finally in.close()
    }
  }

  /** Asset-href signing (`sign_api_url`, the reference's Planetary-
    * Computer-style token endpoint): GET sign?href=<asset>; the
    * response is either JSON `{"href": signed}` or the signed URL
    * itself. No signer configured → href passes through. */
  private def sign(href: String, ctx: StepContext): String =
    ctx.argOpt("sign_api_url") match {
      case Some(s) =>
        val sep = if (s.toString.contains("?")) "&" else "?"
        val u = s.toString + sep + "href=" +
          java.net.URLEncoder.encode(href, "UTF-8")
        val resp = fetchDoc(u, ctx).trim
        try JsonUtil.parse(resp) match {
          case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
            .get("href").map(_.toString).getOrElse(resp)
          case _ => resp
        } catch { case _: Exception => resp }
      case None => href
    }

  private def fetchDoc(url: String, ctx: StepContext): String =
    if (url.startsWith("file:"))
      Files.readString(Paths.get(URI.create(url)))
    else httpGet(url, ctx)

  /** Paged search: `page_size` becomes the request's `limit` and pages
    * chain through the FeatureCollection's `rel: next` link (the STAC
    * API paging contract) until exhausted or `max_items` collected —
    * item filters stay source-side per page, so an unbounded catalog
    * never materializes in memory. A visited-URL set guards circular
    * next links. file:// pages chain identically (network-free tests). */
  private def search(ctx: StepContext): List[Map[String, Any]] = {
    val api = ctx.argStr("api_url")
    val pageSize = ctx.argInt("page_size", 0)
    val maxItems = ctx.argInt("max_items", 0)
    val first = if (pageSize > 0 && !api.startsWith("file:")) {
      val sep = if (api.contains("?")) "&" else "?"
      s"$api${sep}limit=$pageSize"
    } else api
    val acc = List.newBuilder[Map[String, Any]]
    var n = 0
    var url: Option[String] = Some(first)
    val visited = scala.collection.mutable.Set[String]()
    while (url.isDefined && (maxItems == 0 || n < maxItems) &&
      visited.add(url.get)) {
      val tree = JsonUtil.parse(fetchDoc(url.get, ctx))
      val (features, next) = tree match {
        case m: Map[_, _] =>
          val mm = m.asInstanceOf[Map[String, Any]]
          val fs = mm.getOrElse("features", Nil) match {
            case l: Seq[_] => l.toList
            case _ => Nil
          }
          val nx = mm.getOrElse("links", Nil) match {
            case l: Seq[_] => l.collectFirst {
              case lm: Map[_, _]
                if lm.asInstanceOf[Map[String, Any]]
                  .get("rel").exists(_.toString == "next") =>
                lm.asInstanceOf[Map[String, Any]]
                  .getOrElse("href", "").toString
            }.filter(_.nonEmpty)
            case _ => None
          }
          (fs, nx)
        case l: Seq[_] => (l.toList, None)
        case _ => (Nil, None)
      }
      val matched = features.map(_.asInstanceOf[Map[String, Any]])
        .filter(matches(_, ctx))
      acc ++= matched
      n += matched.size
      url = next
    }
    acc.result()
  }

  private def httpGet(url: String, ctx: StepContext): String = {
    val timeout = ctx.argInt("timeout_seconds", 180)
    val conn = URI.create(url).toURL.openConnection()
    conn.setConnectTimeout(timeout * 1000)
    conn.setReadTimeout(timeout * 1000)
    val in = conn.getInputStream
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  /** ISO timestamp or date-only string → Instant; date-only parses to
    * start-of-day (or end-of-day for interval end bounds, per STAC).
    * Tolerant: offset-less timestamps (common in real catalogs) are
    * taken as UTC; an unparseable value yields None — the FILTER treats
    * that as "matches" rather than aborting the whole download. */
  private def parseDt(s: String, endOfDay: Boolean): Option[java.time.Instant] = {
    val t = s.trim
    try {
      if (t.matches("\\d{4}-\\d{2}-\\d{2}")) {
        val d = java.time.LocalDate.parse(t)
        val ldt = if (endOfDay) d.atTime(java.time.LocalTime.MAX)
                  else d.atStartOfDay()
        Some(ldt.toInstant(java.time.ZoneOffset.UTC))
      } else try Some(java.time.OffsetDateTime.parse(t).toInstant)
      catch {
        case _: java.time.format.DateTimeParseException =>
          Some(java.time.LocalDateTime.parse(t)
            .toInstant(java.time.ZoneOffset.UTC))
      }
    } catch { case _: Exception => None }
  }

  /** collection + bbox intersection + datetime range + query_json
    * property filters. */
  private def matches(item: Map[String, Any], ctx: StepContext): Boolean = {
    val props = item.getOrElse("properties", Map.empty)
      .asInstanceOf[Map[String, Any]]
    // `collection` selects the searched collection
    // (/root/reference/pipelines/sentinel/download-sentinel2-l2a-michigan.yml:46);
    // items without the field pass (tolerant, like the other filters)
    val collOk = ctx.argOpt("collection").forall { c =>
      item.get("collection").forall(_.toString == c.toString)
    }
    val bboxOk = ctx.argOpt("bbox") match {
      case Some(q: Seq[_]) =>
        val qb = q.map(_.toString.toDouble)
        item.get("bbox") match {
          case Some(b: Seq[_]) =>
            val ib = b.map(_.toString.toDouble)
            ib(0) <= qb(2) && ib(2) >= qb(0) && ib(1) <= qb(3) && ib(3) >= qb(1)
          case _ => true
        }
      case _ => true
    }
    val dtOk = ctx.argOpt("datetime") match {
      case Some(range) =>
        val Array(start, end) = range.toString.split("/", 2)
        props.get("datetime").forall { d =>
          // Compare as Instants, not raw strings: a date-only end bound
          // must cover the whole day (STAC interval semantics — the
          // string compare dropped items stamped later that day), and
          // mixed offset spellings ('+00:00' vs 'Z') order incorrectly
          // lexicographically. Unparseable values are included, never
          // fatal.
          parseDt(d.toString, endOfDay = false).forall { t =>
            (start == ".." ||
              parseDt(start, endOfDay = false).forall(!t.isBefore(_))) &&
              (end == ".." ||
                parseDt(end, endOfDay = true).forall(!t.isAfter(_)))
          }
        }
      case None => true
    }
    val queryOk = ctx.argOpt("query_json") match {
      case Some(q) =>
        val filters = JsonUtil.parse(q.toString).asInstanceOf[Map[String, Any]]
        filters.forall { case (field, cond) =>
          val ops = cond.asInstanceOf[Map[String, Any]]
          props.get(field) match {
            case Some(v) =>
              val x = v.toString.toDouble
              ops.forall {
                case ("lt", t) => x < t.toString.toDouble
                case ("lte", t) => x <= t.toString.toDouble
                case ("gt", t) => x > t.toString.toDouble
                case ("gte", t) => x >= t.toString.toDouble
                case ("eq", t) => x == t.toString.toDouble
                case _ => true
              }
            case None => false
          }
        }
      case None => true
    }
    collOk && bboxOk && dtOk && queryOk
  }
}
