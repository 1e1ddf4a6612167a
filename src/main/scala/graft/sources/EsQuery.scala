package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Elasticsearch-style bool-query AST → Catalyst predicate tree
  * (SURVEY.md §2.1 S7; reference api_clients.py:645-950 builds term/
  * range/match_phrase bool queries and a `_source` projection against the
  * London Planning ES endpoint).
  *
  * In the zero-egress build the "server" is a parquet table: translating
  * the AST to Columns hands the same predicates to Catalyst, which pushes
  * them into the scan — the exact analog of ES server-side filtering
  * (and the reason the reference moved its outline filter server-side,
  * api_clients.py:673-675). A live DataSourceV2 would reuse this AST for
  * SupportsPushDownFilters. */
object EsQuery {

  sealed trait Clause { def toColumn: Column }

  /** term: exact field match. */
  final case class Term(field: String, value: Any) extends Clause {
    def toColumn: Column = col(field) === lit(value)
  }

  /** range: gte/lt bounds (either optional). */
  final case class Range(field: String, gte: Option[Any] = None,
      lt: Option[Any] = None) extends Clause {
    def toColumn: Column = {
      val lower = gte.map(v => col(field) >= lit(v))
      val upper = lt.map(v => col(field) < lit(v))
      (lower.toSeq ++ upper.toSeq).reduceOption(_ && _).getOrElse(lit(true))
    }
  }

  /** match_phrase: substring containment (the ES analyzer nuance is out
    * of scope — the reference uses it as phrase containment). */
  final case class MatchPhrase(field: String, phrase: String) extends Clause {
    def toColumn: Column = col(field).contains(phrase)
  }

  /** bool: must=AND, should=OR (≥1), mustNot=NOT. */
  final case class Bool(must: Seq[Clause] = Nil, should: Seq[Clause] = Nil,
      mustNot: Seq[Clause] = Nil) extends Clause {
    def toColumn: Column = {
      val m = must.map(_.toColumn).reduceOption(_ && _)
      val s = should.map(_.toColumn).reduceOption(_ || _)
      val n = mustNot.map(_.toColumn).reduceOption(_ || _).map(!_)
      (m.toSeq ++ s.toSeq ++ n.toSeq).reduceOption(_ && _).getOrElse(lit(true))
    }
  }

  /** Run a bool query with a `_source` projection over a table —
    * filter + select, both pushed into the scan by Catalyst. */
  def search(table: DataFrame, query: Clause, source: Seq[String],
      size: Option[Int] = None): DataFrame = {
    val filtered = table.filter(query.toColumn).select(source.map(col): _*)
    size.fold(filtered)(filtered.limit)
  }
}
