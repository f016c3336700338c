package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import scala.collection.concurrent.TrieMap

/** Session-owned memo store — per-session caches whose LIFETIME is the
  * session's own, enforced structurally rather than bookkept.
  *
  * The holder is an identity optimizer rule appended to the session's
  * `experimental.extraOptimizations`: the only strong path to the cached
  * values is session ⇒ sessionState ⇒ extraOptimizations ⇒ holder ⇒
  * maps, so a session that becomes unreachable takes its memos (and the
  * session-bound DataFrames they pin) with it. No global registry exists
  * to leak through — the failure mode of the WeakHashMap-keyed caches
  * this replaces: WeakHashMap documents that a value strongly reaching
  * its key pins the entry forever, and a cached DataFrame always
  * strongly reaches its session; the previously-suggested cure (anchor a
  * holder on the session's listenerManager) is no cure at all, because
  * listener registrations land on the SparkContext's shared
  * LiveListenerBus and therefore live for the CONTEXT's lifetime, not
  * the session's ([[SummaryRewrite]] carries the same analysis for its
  * registry).
  *
  * The rule itself is a no-op pass (returns the plan unchanged), so the
  * optimizer-batch cost is one virtual call per query. `memo` hands out
  * namespaced TrieMaps; callers own key hygiene within their namespace.
  */
final class SessionMemo private[plans] () extends Rule[LogicalPlan] {
  private[plans] val maps = TrieMap.empty[String, AnyRef]
  override def apply(plan: LogicalPlan): LogicalPlan = plan
}

object SessionMemo {

  private def holderFor(s: SparkSession): SessionMemo = synchronized {
    s.experimental.extraOptimizations.collectFirst {
      case m: SessionMemo => m
    }.getOrElse {
      val m = new SessionMemo
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ m
      m
    }
  }

  /** The session's memo map for `namespace`, created on first use. The
    * caller chooses K/V; one namespace must always use the same types
    * (the cast is unchecked by design — namespaces are private to their
    * call site).
    */
  def memo[K, V](s: SparkSession, namespace: String): TrieMap[K, V] =
    holderFor(s).maps
      .getOrElseUpdate(namespace, TrieMap.empty[K, V])
      .asInstanceOf[TrieMap[K, V]]
}
